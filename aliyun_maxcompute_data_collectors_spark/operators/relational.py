"""Relational convenience operators the host engines provide around the
reference's connectors: top-k per group, gap-based sessionization, unique
map keys.

All window/groupBy compositions - single shuffle each, AQE-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    k: int,
) -> DataFrame:
    """Top-k rows per group via row_number - one shuffle on the group key;
    at scale prefer this over orderBy+limit inside a loop (never collect)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    rn = "__rank__"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .where(F.col(rn) <= k)
        .withColumnRenamed(rn, "rank")
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    time_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds ``gap``.  Session id = first event time's
    epoch seconds per session, unique per user.

    Pure window composition (lag -> flag -> running sum) - a single shuffle
    on the user key; the streaming twin is session_window/
    applyInPandasWithState in streaming/."""
    gap_expr = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(user_col).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    new_session = (prev.isNull() | (F.col(time_col) > prev + gap_expr)).cast("int")
    sess_num = F.sum(new_session).over(
        Window.partitionBy(user_col).orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_seq", sess_num)


def session_stats(
    df: DataFrame,
    user_col: str,
    time_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session rollup: bounds, event count, duration seconds."""
    s = sessionize(df, user_col, time_col, gap)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_s",
            (F.unix_micros(F.col("session_end").cast("timestamp"))
             - F.unix_micros(F.col("session_start").cast("timestamp"))) / 1_000_000,
        )
    )


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    num_bins: int = 256,
) -> DataFrame:
    """2-D Pareto frontier (skyline): rows not dominated by any other row,
    where q dominates p iff q is <= on ``minimize_col`` and >= on
    ``maximize_col`` with at least one strict.

    The textbook formulation is a NOT EXISTS self-join — quadratic pair
    work, a broadcast-nested-loop at scale.  For two dimensions the frontier
    is instead a running-max scan over ascending cost: a row survives iff no
    strictly-cheaper value reached its score (>=) and no cheaper-or-equal
    value beat it (>).  A single global window would funnel every distinct
    cost through one partition, so the scan is two-level (the classic
    distributed prefix-scan):

    1. aggregate best ``maximize_col`` per distinct cost (one shuffle);
    2. bin costs into ``num_bins`` value ranges; per-bin maxima — a
       bounded, metadata-scale table — come to the driver, where the
       cross-bin prefix max is computed and broadcast back (same pattern
       as AQE statistics / the catalog's zonemap: O(bins) rows, never data);
    3. the within-bin running max is a window PARTITIONED by bin —
       parallel, no global exchange;
    4. join the per-cost bounds back (shuffle on cost) and filter.

    Rows equal on both dimensions do not dominate each other (dominance
    needs one strict inequality), so exact duplicates of a frontier point
    all survive — same convention as DuckDB's NOT EXISTS form.
    """
    from aliyun_maxcompute_data_collectors_spark.operators.prefixscan import running_agg

    mx = F.col(maximize_col)
    per_cost = df.groupBy(minimize_col).agg(F.max(mx).alias("__best"))
    bounds = running_agg(
        per_cost, minimize_col, "__best", agg="max", num_bins=num_bins
    ).select(
        minimize_col,
        F.col("__upto").alias("__best_upto"),
        F.col("__below").alias("__best_below"),
    )
    joined = df.join(bounds, minimize_col)
    dominated = (
        (F.col("__best_below").isNotNull() & (F.col("__best_below") >= mx))
        | (F.col("__best_upto") > mx)
    )
    return joined.where(~dominated).drop("__best_upto", "__best_below")


def zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flagging: rows where
    ``|x - mean| > threshold * stddev_pop`` of their group.

    Aggregate-then-broadcast-join (two-pass) rather than a whole-partition
    window: the group stats table is tiny (one row per group) so the join
    broadcasts, and the big side is never sorted — at 100 TB that saves the
    per-partition sort a window formulation would force."""
    stats = df.groupBy(*group_cols).agg(
        F.avg(F.col(value_col)).alias("__mu"),
        F.stddev_pop(F.col(value_col)).alias("__sigma"),
    )
    out = df.join(F.broadcast(stats), group_cols)
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        out.withColumn("zscore", z.cast("double"))
        .where(F.col("__sigma") > 0)
        .where(F.abs(F.col("zscore")) > threshold)
        .drop("__mu", "__sigma")
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[Column],
    max_gap: str | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each step was
    reached STRICTLY AFTER the previous step (product-analytics "signup →
    view → purchase" conversion).  Output: one row per user who completed
    step 1, with ``step_1..step_N`` timestamps (NULL once the funnel breaks).
    ``max_gap`` (e.g. ``"7 days"``) additionally requires each step to
    happen within that interval of the previous one — the "converted within
    a week" business question.

    Each stage is a filtered aggregate on the SAME key (min ts per user
    with ``ts > previous step``), so the plan is a cascade of groupBy +
    join all hash-partitioned on the user key — AQE reuses the
    partitioning; per-stage state is one timestamp per user.  No window
    over whole user histories, no collect_list of events.
    """
    if not steps:
        raise ValueError("funnel needs at least one step predicate")
    ts = F.col(ts_col)
    gap = F.expr(f"INTERVAL {max_gap}") if max_gap else None
    cur = (
        df.where(steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("step_1"))
    )
    out = cur
    for i, pred in enumerate(steps[1:], start=2):
        cond = ts > F.col("__prev")
        if gap is not None:
            cond = cond & (ts <= F.col("__prev") + gap)
        nxt = (
            df.where(pred)
            .join(out.select(user_col, F.col(f"step_{i-1}").alias("__prev")), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts).alias(f"step_{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day, counted
    distinct on each later activity day as an offset from the cohort day —
    the (cohort_day, day_offset) -> active_users triangle.

    Two aggregates + one join, all shuffled on the user key, then one
    count-distinct agg on (cohort, offset) — no window, no per-user arrays;
    at 100 TB the cohort table is one narrow row per user.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    cohorts = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    return (
        df.select(user_col, day.alias("activity_day"))
        .join(cohorts, user_col)
        .groupBy(
            "cohort_day",
            F.datediff(F.col("activity_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("active_users"))
    )


def unique_map_keys(entries: Column, last_wins: bool = True) -> Column:
    """Build a map from an array<struct<key,value>> with duplicate keys
    deduplicated - enableUniqueMapKey semantics (OdpsScan.scala:138,
    SQLQuerySuite.scala:251: duplicate keys must dedup rather than fail).

    ``last_wins`` keeps the last occurrence (the reference keeps one
    deterministically); set False for first-wins."""
    # aggregate entries into a map, overwriting (or keeping) on duplicates
    start = F.create_map().cast("map<string,string>")
    if last_wins:
        upd = lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != e["key"]),
            F.create_map(e["key"], e["value"]),
        )
    else:
        upd = lambda acc, e: F.when(
            F.array_contains(F.map_keys(acc), e["key"]), acc
        ).otherwise(F.map_concat(acc, F.create_map(e["key"], e["value"])))
    return F.aggregate(entries, start, upd)
