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
