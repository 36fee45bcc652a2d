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
