"""Time-based partition assignment.

Parity: Flink ``DateTimePartitionAssigner.java:35-36,72-89`` - partition
value = ``format(time)``, default pattern ``yyyy-MM-dd--HH`` (hourly tumbling
file partitions).  The reference uses processing time only; we support both
processing time (default, matching) and any event-time column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PATTERN = "yyyy-MM-dd--HH"
DEFAULT_PARTITION_COL = "dt"


def datetime_partition_value(
    time_col: Column | None = None,
    pattern: str = DEFAULT_PATTERN,
) -> Column:
    """Partition-value expression; ``time_col=None`` = processing time
    (current_timestamp), matching the reference's default."""
    c = F.current_timestamp() if time_col is None else time_col
    return F.date_format(c, pattern)


def with_time_partition(
    df: DataFrame,
    time_col: str | None = None,
    pattern: str = DEFAULT_PATTERN,
    partition_col: str = DEFAULT_PARTITION_COL,
) -> DataFrame:
    """Attach the partition column; write with ``.partitionBy(partition_col)``
    (batch) or ``writeStream.partitionBy`` (ST3 dynamic stream partitions)."""
    c = F.col(time_col) if time_col else None
    return df.withColumn(partition_col, datetime_partition_value(c, pattern))
