"""Table profiling and declarative data-quality constraint checks.

The reference surfaces per-table statistics to the engine for planning
(``OdpsScan.scala:267-279`` sizeInBytes/numRows; ``OdpsTableCatalog.scala:438-440``)
and validates writes (dynamic-partition limit ``OdpsWriteBuilder.scala:144-156``,
``enhanceWriteCheck`` ``OdpsOptions.scala:108``).  This module generalizes both
into first-class operators a training-data pipeline needs:

- :func:`profile` — one-pass per-column statistics (null counts, distincts,
  min/max) in a long/tidy layout, the shape a catalog would persist.
- :func:`check_constraints` — declarative rules (not_null / range / regex /
  unique / foreign_key) evaluated with the minimum number of passes.

Scale notes (100 TB): ``profile`` computes every row-local aggregate in ONE
scan; exact distincts add one Expand pass (Spark's standard multi-distinct
plan) — pass ``approx_distinct=True`` to use HLL sketches (one pass, no
expand, mergeable across partitions).  ``check_constraints`` folds all
row-local rules into a single aggregate scan; ``unique`` adds one hash
aggregate on the key; ``foreign_key`` is a broadcast anti-join when the
referenced side is dimension-sized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_NUMERIC = {"tinyint", "smallint", "int", "integer", "bigint", "long",
            "float", "double"}


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile(df: DataFrame, columns: Sequence[str] | None = None,
            approx_distinct: bool = False) -> DataFrame:
    """Per-column statistics in long format, computed in one aggregate pass.

    Output schema: ``col_name string, n_rows long, n_null long, n_distinct
    long, min_num double, max_num double, min_text string, max_text string``
    — numeric mins/maxes land in ``*_num`` (as double), string ones in
    ``*_text``; the inapplicable pair is NULL.  (``col_name``, not
    ``column`` — COLUMN is a reserved word in ANSI SQL.)  Deterministic
    across engines: no double→string casts (formatting differs).
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else [
        c for c, t in df.dtypes if _is_numeric(t) or t == "string"
    ]
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown column {c!r}")
        if not (_is_numeric(dtypes[c]) or dtypes[c] == "string"):
            raise ValueError(f"unsupported dtype {dtypes[c]} for {c!r}; "
                             "profile only numeric and string columns")

    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"__nd_{c}"))
        if _is_numeric(dtypes[c]):
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        else:
            aggs.append(F.min(col).alias(f"__min_{c}"))
            aggs.append(F.max(col).alias(f"__max_{c}"))

    one = df.agg(*aggs)
    # one wide row -> long format via an inline array of structs; this stays
    # on the single aggregated row, so the "explode" is driver-trivial.
    structs = []
    for c in cols:
        numeric = _is_numeric(dtypes[c])
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if numeric else F.col(f"__min_{c}")).alias("min_text"),
            (F.lit(None).cast("string") if numeric else F.col(f"__max_{c}")).alias("max_text"),
        ))
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def check_constraints(df: DataFrame, rules: Sequence[tuple],
                      ref_tables: dict[str, DataFrame] | None = None) -> DataFrame:
    """Evaluate declarative data-quality rules; returns ``(rule string,
    violations long)``, one row per rule, ordered by rule name.

    Rule forms (name is the first element, must be unique):
      ``(name, "not_null", col)``
      ``(name, "range", col, lo, hi)``          # violations outside [lo, hi]
      ``(name, "regex", col, pattern)``         # non-matching, non-null rows
      ``(name, "unique", [cols...])``           # n_rows_with_key - n_distinct_keys
      ``(name, "foreign_key", [cols...], ref_name, [ref_cols...])``
                                                # child rows with no parent
    ``ref_tables`` maps ``ref_name`` -> DataFrame for foreign_key rules.
    """
    row_local: list[tuple[str, F.Column]] = []   # (name, indicator expr)
    extra: list[DataFrame] = []                  # 1-row frames from other passes
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    for rule in rules:
        name, kind = rule[0], rule[1]
        if kind == "not_null":
            col = F.col(rule[2])
            row_local.append((name, col.isNull()))
        elif kind == "range":
            col, lo, hi = F.col(rule[2]), rule[3], rule[4]
            row_local.append((name, col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))))
        elif kind == "regex":
            col, pat = F.col(rule[2]), rule[3]
            row_local.append((name, col.isNotNull() & ~col.rlike(pat)))
        elif kind == "unique":
            keys = [F.col(c) for c in rule[2]]
            non_null = df.where(F.lit(True))
            for k in keys:
                non_null = non_null.where(k.isNotNull())
            extra.append(non_null.agg(
                (F.count(F.lit(1)) - F.count_distinct(*keys)).alias("violations")
            ).select(F.lit(name).alias("rule"), "violations"))
        elif kind == "foreign_key":
            child_cols, ref_name, parent_cols = rule[2], rule[3], rule[4]
            if not ref_tables or ref_name not in ref_tables:
                raise ValueError(f"foreign_key rule {name!r}: unknown ref {ref_name!r}")
            parent = ref_tables[ref_name].select(
                *[F.col(p).alias(f"__fk_{i}") for i, p in enumerate(parent_cols)]
            ).dropDuplicates()
            cond = None
            child = df
            for i, c in enumerate(child_cols):
                child = child.where(F.col(c).isNotNull())
                eq = F.col(c) == F.col(f"__fk_{i}")
                cond = eq if cond is None else (cond & eq)
            orphans = child.join(F.broadcast(parent), cond, "left_anti")
            extra.append(orphans.agg(F.count(F.lit(1)).alias("violations"))
                         .select(F.lit(name).alias("rule"), "violations"))
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    parts: list[DataFrame] = []
    if row_local:
        # all row-local rules in ONE scan: sum of boolean indicators
        agg = df.agg(*[
            F.sum(ind.cast("long")).alias(f"__v_{i}")
            for i, (_, ind) in enumerate(row_local)
        ])
        structs = [
            F.struct(F.lit(name).alias("rule"),
                     F.coalesce(F.col(f"__v_{i}"), F.lit(0)).cast("long").alias("violations"))
            for i, (name, _) in enumerate(row_local)
        ]
        parts.append(agg.select(F.explode(F.array(*structs)).alias("s")).select("s.*"))
    parts.extend(extra)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("rule", F.col("violations").cast("long").alias("violations")) \
              .orderBy("rule")
