"""Distributed range (interval-containment) join and hypertable-style
multi-resolution rollups.

Both are "custom operator" compositions (SURVEY 2.4 J3: the reference
delegates joins/aggs to the host engine; Spark lacks these two as
primitives).  Both are built purely from DataFrame ops.

Range join scale story: Spark plans ``p.ts BETWEEN i.start AND i.end`` with
no equi-key as BroadcastNestedLoopJoin (O(N*M) comparisons, driver-killing
on big sides).  The bin trick restores an equi-key: every interval is
exploded to the time bins it covers, every point is tagged with its bin,
and the join becomes an equijoin on (keys..., bin) followed by the exact
containment filter.  Cost = one shuffle of points + intervals x avg bins
per interval; pick ``bin_seconds`` ~ median interval length so the
explosion factor stays small (1-3 rows per interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_time <= end`` (and equal ``keys``), as an equijoin on
    (keys, time bin) - never a nested-loop join.

    ``how='left'`` keeps unmatched points with NULL interval columns.
    Column collisions must be resolved by the caller (select/alias first).
    """
    keys = keys or []
    # second-granularity longs (~2e9) divide exactly in double; micros would
    # not (see the ns->us precision gotcha in session.py)
    def _bin(c):
        return F.floor(F.unix_timestamp(F.col(c).cast("timestamp")) / bin_seconds).cast("long")

    p_bin, s_bin, e_bin = _bin(point_time), _bin(start_col), _bin(end_col)

    tagged_points = points.withColumn("__bin", p_bin)
    exploded = intervals.withColumn("__bin", F.explode(F.sequence(s_bin, e_bin)))

    cond = F.col(point_time).between(F.col(start_col), F.col(end_col))
    joined = tagged_points.join(exploded, [*keys, "__bin"], "inner").where(cond)

    if how == "inner":
        return joined.drop("__bin")
    if how == "left":
        # left variant: re-attach the non-matching points
        matched = joined.drop("__bin")
        iv_cols = [c for c in intervals.columns if c not in keys]
        anti = tagged_points.drop("__bin").join(
            matched.select(*points.columns).distinct(), points.columns, "left_anti")
        for c in iv_cols:
            anti = anti.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
        return matched.unionByName(anti)
    raise ValueError(f"how must be inner|left, got {how!r}")


def rollup_cascade(
    df: DataFrame,
    time_col: str,
    resolutions: list[str],
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: aggregate the raw
    stream once at the finest resolution, then derive every coarser level by
    RE-aggregating the previous level (sum of sums, sum of counts, min of
    mins...).  At 100 TB the raw table is touched exactly once; each coarser
    rollup reads the (orders-of-magnitude smaller) previous rollup.

    ``resolutions`` must be ordered fine -> coarse and each must evenly
    nest into the next (e.g. ["1 hour", "1 day"]).  Returns the union of all
    levels tagged with a ``resolution`` column.
    """
    group_cols = group_cols or []
    levels = []
    base = None
    for res in resolutions:
        if base is None:
            base = (
                df.groupBy(F.window(time_col, res).alias("w"), *group_cols)
                .agg(
                    F.sum(value_col).alias("sum_v"),
                    F.count(F.lit(1)).alias("n"),
                    F.min(value_col).alias("min_v"),
                    F.max(value_col).alias("max_v"),
                )
            )
        else:
            base = (
                base.groupBy(F.window(F.col("w.start"), res).alias("w"), *group_cols)
                .agg(
                    F.sum("sum_v").alias("sum_v"),
                    F.sum("n").alias("n"),
                    F.min("min_v").alias("min_v"),
                    F.max("max_v").alias("max_v"),
                )
            )
        levels.append(base.withColumn("resolution", F.lit(res)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "resolution", F.col("w.start").alias("bucket_start"), *group_cols,
        "sum_v", "n", "min_v", "max_v",
    )
