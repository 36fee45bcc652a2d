"""%{...} routing templates.

Parity: the ``%{column}`` / ``%{datetime-pattern}`` string templating used to
route rows to tables/partitions on ingest
(``odps-sqoop/.../OdpsUploadProcessor.java:211-233``,
``ogg-plugin/.../util/BucketPath.java:30-35``).

Spark-first: the template compiles to a single concat() Column expression -
fully JVM-side, codegen-friendly, no per-row Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(r"%\{([^}]+)\}")

# a token is a datetime pattern only if composed entirely of Java
# date-format characters/separators (e.g. 'yyyy-MM-dd', 'HH'); anything else
# is a column reference - the same disambiguation BucketPath applies
_DT_PATTERN = re.compile(r"[yMdHmsSDwWFkKhaGXZz\-/:. ']+")


def render_template(
    template: str,
    time_col: str | Column | None = None,
    columns: set[str] | None = None,
) -> Column:
    """Compile ``'a/%{col}/dt=%{yyyy-MM-dd}'`` into a Column.

    A token is a datetime pattern if it matches Java date-format characters
    and is not declared in ``columns``; otherwise it is a column reference -
    the same disambiguation BucketPath applies.
    """
    tc = F.col(time_col) if isinstance(time_col, str) else time_col
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        token = m.group(1)
        is_col = columns is not None and token in columns
        looks_dt = _DT_PATTERN.fullmatch(token) is not None and not is_col
        if looks_dt:
            base = tc if tc is not None else F.current_timestamp()
            parts.append(F.date_format(base, token))
        else:
            parts.append(F.col(token).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def route_to_tables(
    catalog,
    df,
    table_template: str,
    time_col: str | None = None,
    static_partition: dict | None = None,
    create_missing: bool = False,
) -> dict[str, int]:
    """Multi-table routing (the %{col} TABLE templating of
    OdpsUploadProcessor.java:211-233): each row's target table name is the
    rendered template; rows group by target and insert per table.

    Target tables must exist (or ``create_missing`` derives their schema from
    ``df`` minus the routing column).  Returns {table: rows_written}.
    Distinct targets are enumerated driver-side - routing templates produce
    a handful of tables, not millions; the per-table insert is a pruned
    single-pass write."""
    from aliyun_maxcompute_data_collectors_spark import types as ot

    # pass the frame's columns so a routing column whose name looks like a
    # date pattern ('ds', 'dd', 'y') is still treated as a column reference
    route = render_template(table_template, time_col=time_col, columns=set(df.columns))
    routed = df.withColumn("__route__", route)
    targets = [r["__route__"] for r in routed.select("__route__").distinct().collect()]
    written: dict[str, int] = {}
    for t in sorted(targets):
        part = routed.where(F.col("__route__") == t).drop("__route__")
        if create_missing:
            cols = [(f.name, ot.to_odps_type(f.dataType)) for f in part.schema.fields]
            catalog.create_table(t, cols, if_not_exists=True)
        n = part.count()
        catalog.insert(t, part, static_partition=static_partition)
        written[t] = n
    return written
