"""Time-series regularization: bucket resampling with gap filling.

The reference's time handling is limited to processing-time partition
assignment (``DateTimePartitionAssigner.java:35-36,72-89``) and the
hypertable-style rollups we build on it; a real time-series workload also
needs REGULAR grids — every bucket present per key, missing buckets
forward-filled.  This implements resample + gap-fill as a composition of
built-in operators (no UDFs):

1. bucket each event (integer epoch arithmetic, map-side),
2. one aggregate per (key, bucket),
3. per-key [min,max] bucket range -> ``sequence()`` + ``explode`` builds the
   dense grid (distributed: the explode fans out from one row per key),
4. left join observed onto the grid (both sides hash-partitioned by key),
5. forward fill = ``last(value, ignorenulls=True)`` over a per-key window.

Scale: the grid size is (range/step) rows per key — bounded and predictable;
everything shuffles on the key, no driver materialization.  Skewed keys
(one user with a year of events) AQE-split like any other join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_start(ts: Column, step_seconds: int) -> Column:
    """Epoch-second bucket start (integer arithmetic; DIV truncates exactly
    like the oracle's // on positive epochs)."""
    secs = F.unix_timestamp(ts)
    return (secs - F.pmod(secs, F.lit(step_seconds))).cast("long")


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: Column | str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-key dense time grid with a decimal-exact per-bucket sum,
    forward-filled across empty buckets.

    Output: ``(key, bucket_start long, n_events long, bucket_sum double?,
    filled_sum double?, is_gap boolean)`` — ``bucket_sum`` is NULL on gap
    rows, ``filled_sum`` carries the last observed bucket's sum (NULL only
    before the first observation, which cannot happen here since the grid
    starts at the key's first bucket).
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    key = F.col(key_col)
    b = bucket_start(F.col(ts_col), step_seconds).alias("bucket_start")
    per = (
        df.select(key.alias(key_col), b, val.cast("decimal(18,6)").alias("v"))
        .groupBy(key_col, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("bucket_sum"),
        )
    )
    rng = per.groupBy(key_col).agg(
        F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1")
    )
    grid = rng.select(
        key_col,
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.lit(int(step_seconds)))
        ).alias("bucket_start"),
    )
    joined = grid.join(per, [key_col, "bucket_start"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "bucket_sum",
        F.last("bucket_sum", ignorenulls=True).over(w).alias("filled_sum"),
        F.col("bucket_sum").isNull().alias("is_gap"),
    )
