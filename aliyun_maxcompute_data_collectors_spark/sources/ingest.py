"""Row-parsing ingest: delimited / regex / JSON event serializers.

Parity: the Flume plugin's serializer family
(``flume-plugin/.../serializer/DelimitedTextSerializer.java:41-108``,
``RegexEventSerializer.java:37-124``, ``JsonTextSerializer.java:46-96``) -
each maps a raw text line to typed columns by delimiter split with column
index mapping, regex group extraction, or JSON field lookup.

Spark-first: each serializer compiles to built-in expressions
(``from_csv`` / ``regexp_extract`` / ``from_json``) over a raw-line column -
codegen-friendly, streaming-safe (works identically on readStream sources).
Bad rows are never dropped silently: ``parsed IS NULL`` / empty-extract rows
route to a dirty side channel (ST6 semantics, BadOperateWriter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_maxcompute_data_collectors_spark import types as ot


def _schema(cols: list[tuple[str, str]]) -> T.StructType:
    return ot.schema_from_odps(cols)


# ---------------------------------------------------------------------------
# delimited
# ---------------------------------------------------------------------------

def parse_delimited(
    df: DataFrame,
    line_col: str,
    columns: list[tuple[str, str]],          # (name, odps_type) in file order
    delimiter: str = ",",
    indexes: list[int] | None = None,        # optional source-field index per column
) -> DataFrame:
    """Delimiter split + positional mapping (DelimitedTextSerializer).

    ``indexes`` mirrors the serializer's column-index mapping: column i takes
    source field ``indexes[i]``.  Type coercion follows RecordUtil ('' -> NULL).
    """
    parts = F.split(F.col(line_col), _regex_escape(delimiter), -1)
    out = []
    for i, (name, typ) in enumerate(columns):
        src = indexes[i] if indexes else i
        raw = parts.getItem(src)
        out.append(ot.coerce_column(raw, ot.parse_odps_type(typ)).alias(name))
    return df.select(*df.columns, *out)


def _regex_escape(s: str) -> str:
    return "".join("\\" + c if c in r"\.[]{}()*+-?^$|" else c for c in s)


# ---------------------------------------------------------------------------
# regex
# ---------------------------------------------------------------------------

def parse_regex(
    df: DataFrame,
    line_col: str,
    pattern: str,
    columns: list[tuple[str, str]],          # (name, odps_type), group i+1 per column
) -> DataFrame:
    """Regex group extraction (RegexEventSerializer): group i+1 -> column i.
    Non-matching lines yield all-NULL columns (and flow to the dirty channel
    via split_dirty)."""
    c = F.col(line_col)
    out = []
    for i, (name, typ) in enumerate(columns):
        raw = F.regexp_extract(c, pattern, i + 1)
        out.append(ot.coerce_column(raw, ot.parse_odps_type(typ)).alias(name))
    return df.select(*df.columns, *out)


# ---------------------------------------------------------------------------
# JSON
# ---------------------------------------------------------------------------

def parse_json(
    df: DataFrame,
    line_col: str,
    columns: list[tuple[str, str]],
    field_map: dict[str, str] | None = None,  # column -> json field (default: same name)
) -> DataFrame:
    """JSON field mapping (JsonTextSerializer) via from_json with a declared
    schema - never inferred, matching the fixed-schema model."""
    fmap = field_map or {}
    json_cols = [(fmap.get(name, name), name, typ) for name, typ in columns]
    js = T.StructType([
        T.StructField(src, ot.parse_odps_type(typ)) for src, _name, typ in json_cols
    ])
    parsed = F.from_json(F.col(line_col), js)
    out = [parsed.getField(src).alias(name) for src, name, typ in json_cols]
    return df.select(*df.columns, F.struct(*out).alias("__parsed__")).select(
        *df.columns, "__parsed__.*"
    )


# ---------------------------------------------------------------------------
# XML
# ---------------------------------------------------------------------------

def parse_xml(
    df: DataFrame,
    line_col: str,
    columns: list[tuple[str, str]],
    field_map: dict[str, str] | None = None,  # column -> xml element (default: same name)
) -> DataFrame:
    """XML element extraction via Spark 4's built-in ``from_xml`` with a
    declared schema — the same fixed-schema contract as parse_json (the
    reference's Kettle/Flume row parsers are schema-declared too, S12/P13).
    Malformed XML yields all-NULL columns and flows to the dirty channel."""
    fmap = field_map or {}
    xml_cols = [(fmap.get(name, name), name, typ) for name, typ in columns]
    xs = T.StructType([
        T.StructField(src, ot.parse_odps_type(typ)) for src, _name, typ in xml_cols
    ])
    parsed = F.from_xml(F.col(line_col), xs)
    out = [parsed.getField(src).alias(name) for src, name, typ in xml_cols]
    return df.select(*df.columns, F.struct(*out).alias("__parsed__")).select(
        *df.columns, "__parsed__.*"
    )


# ---------------------------------------------------------------------------
# dirty-record side channel (ST6)
# ---------------------------------------------------------------------------

def split_dirty(
    parsed: DataFrame,
    required: list[str],
    raw_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty): a row is dirty when any required parsed column is
    NULL.  ``dirty`` keeps the raw line columns for the bad-record file
    (BadOperateWriter semantics: failures preserved, never dropped)."""
    cond = None
    for c in required:
        x = F.col(c).isNull()
        cond = x if cond is None else (cond | x)
    dirty = parsed.where(cond).select(*raw_cols)
    clean = parsed.where(~cond)
    return clean, dirty


def write_dirty(dirty: DataFrame, path: str, max_records: int | None = None) -> None:
    """Append dirty rows to a side-channel directory; ``max_records`` caps
    the channel like the reference's bad-file cap."""
    out = dirty.limit(max_records) if max_records else dirty
    out.write.mode("append").json(path)
