"""Key-based merge (incremental reconcile).

Parity: Sqoop's MergeJob (``odps-sqoop/src/java/org/apache/sqoop/mapreduce/
MergeJob.java:53-126`` + ``MergeReducerBase.java``): old + new datasets are
co-grouped on ``--merge-key`` and the newest record per key wins.

Spark-first: a single window dedup - one shuffle on the key, no co-group
materialization.  At 100 TB the shuffle partitions on the merge key; AQE
handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RN = "__merge_rn__"


def newest_wins(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep the newest row per key; ``order_by`` columns rank recency
    ascending (latest value wins).  Deterministic given a unique tiebreak in
    ``order_by``."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )


def merge_datasets(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """Sqoop merge: union old+new, newest per key wins.  ``new`` rows beat
    ``old`` rows on order ties via a provenance column (matching MergeJob,
    where the new dataset shadows the old)."""
    prov = "__merge_src__"
    u = old.withColumn(prov, F.lit(0)).unionByName(new.withColumn(prov, F.lit(1)))
    return newest_wins(u, keys, order_by + [prov]).drop(prov)
