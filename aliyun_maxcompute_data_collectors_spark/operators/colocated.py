"""Co-located (shuffle-free) joins via Spark-native bucketed tables.

The ODPS-hash bucketing in the catalog gives *layout parity* with the
reference (bucket dirs, point lookups).  For *join co-location* inside Spark
itself, the session catalog's own bucketing is the mechanism Catalyst
understands: two tables bucketed by the same key into the same bucket count
join with ZERO exchanges - at 100 TB that deletes the dominant cost of a
fact-fact join.

This module wraps that path (bucketBy + sortBy + saveAsTable) and provides
the plan assertion that proves the shuffle is gone.  Counterpart of the
reference's bucketed-table shuffle semantics (SURVEY 2.9/O5) executed the
Spark-native way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aliyun_maxcompute_data_collectors_spark.plans.checks import shuffle_count


def write_colocated(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Spark-bucketed session-catalog table.  Joins
    between tables written with the same (num_buckets, bucket_cols) need no
    exchange; sort_cols additionally enable merge-join without sorting."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables; disables broadcast so the bucket-join
    path is taken (at real scale both sides exceed the broadcast threshold
    anyway and no hint is needed)."""
    left = spark.table(left_table).hint("shuffle_merge")
    right = spark.table(right_table)
    return left.join(right, on, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Proof obligation: the co-located join plan contains no exchange."""
    n = shuffle_count(df)
    if n != 0:
        from aliyun_maxcompute_data_collectors_spark.plans.checks import executed_plan
        raise AssertionError(
            f"expected a shuffle-free co-located join, found {n} exchanges:\n"
            f"{executed_plan(df)}"
        )
