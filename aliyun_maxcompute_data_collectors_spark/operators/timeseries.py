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
from pyspark.sql import types as T
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

    Fused plan (same shape as ``gapfill_interpolated``): each observed
    bucket emits itself plus the gap buckets since the previous observation
    and forward-fills them from the lag value it already holds — aggregate,
    one lag window, one generator; no dense-grid materialization, no join
    back, no running ignorenulls window.  2 exchanges total.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    key = F.col(key_col)
    step = int(step_seconds)
    b = bucket_start(F.col(ts_col), step).alias("bucket_start")
    per = (
        df.select(key.alias(key_col), b, val.cast("decimal(18,6)").alias("v"))
        .groupBy(key_col, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("bucket_sum"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("bucket_start")
    # last NON-NULL sum strictly before the current bucket: keeps the old
    # composition's behavior for all-NULL-value buckets (they stay is_gap
    # and carry the previous observed sum forward)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    obs = per.select(
        key_col, "n_events", "bucket_sum",
        F.col("bucket_start").alias("__cb"),
        F.lag("bucket_start").over(w).alias("__pb"),
        F.last("bucket_sum", ignorenulls=True).over(w_prev).alias("__pv"),
    )
    cur, pb = F.col("__cb"), F.col("__pb")
    x = F.explode(
        F.sequence(F.coalesce(pb + step, cur), cur, F.lit(step))
    ).alias("__x")
    rows = obs.select(key_col, "n_events", "bucket_sum", "__pv", "__cb", x)
    is_obs = F.col("__x") == F.col("__cb")
    bsum = F.when(is_obs, F.col("bucket_sum"))
    return rows.select(
        key_col,
        F.col("__x").alias("bucket_start"),
        F.when(is_obs, F.col("n_events")).otherwise(F.lit(0)).alias("n_events"),
        bsum.alias("bucket_sum"),
        F.coalesce(bsum, F.col("__pv")).alias("filled_sum"),
        bsum.isNull().alias("is_gap"),
    )


def interpolate_linear(
    grid: DataFrame,
    key_col: str,
    x_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation of NULL values along a per-key numeric axis.

    For each NULL row, draws the line between the previous and next non-NULL
    observation: ``prev + (next - prev) * (x - x_prev) / (x_next - x_prev)``.
    Leading/trailing NULLs (no bracketing pair) stay NULL.  Pure window
    composition — two ordered passes (forward carry, backward carry) over the
    same per-key sort, which Catalyst executes on a single exchange+sort; no
    UDF, no self-join, state per key is O(1).
    """
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(F.col(x_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(key_col)
        .orderBy(F.col(x_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs = F.when(v.isNotNull(), F.struct(F.col(x_col).alias("x"), v.alias("v")))
    prev = F.last(obs, ignorenulls=True).over(fwd)
    nxt = F.first(obs, ignorenulls=True).over(bwd)
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"]
            + (nxt["v"] - prev["v"])
            * (F.col(x_col) - prev["x"])
            / (nxt["x"] - prev["x"]),
        )
    )
    return grid.withColumn(f"{value_col}_interp", interp.cast("double"))


def gapfill_interpolated(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: Column | str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Dense per-key time grid with NULL buckets linearly interpolated -
    the fused form of ``resample_fill`` + ``interpolate_linear``.

    Instead of materializing the grid (range aggregate -> sequence explode
    -> left join back) and then bracketing every gap with forward/backward
    windows, each OBSERVED bucket emits itself plus the gap buckets since
    the previous observation, and interpolates those gaps from the
    (lag, current) pair it already holds.  Every gap is bracketed by
    construction - identical semantics, but the plan drops from
    4 exchanges + join + 2 window passes to 2 exchanges + 1 sort + 1
    explode: aggregate on (key, bucket), one lag window on key, one
    generator.  At 100 TB that removes the join shuffle of the full dense
    grid - the widest intermediate in the old plan.

    Interpolation is spelled ``pv + (cv - pv) * (x - pb) / (cb - pb)`` -
    the same IEEE association as the SQL oracle, so ties round identically.

    Precondition: buckets whose aggregate sum is NULL (every value in the
    bucket NULL) are treated as observed anchors with a NULL interpolant,
    not re-interpolated from their neighbors - filter NULL values upstream
    if they can occur (the unfused composition bracketed such buckets,
    which a single forward pass cannot).

    Output: ``(key, bucket_start long, n_events long, bucket_sum double?,
    <value>_interp double)`` - matching interpolate_linear's column name.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    step = int(step_seconds)
    b = bucket_start(F.col(ts_col), step).alias("bucket_start")
    per = (
        df.select(F.col(key_col), b, val.cast("decimal(18,6)").alias("v"))
        .groupBy(key_col, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v"), 2).cast("double").alias("bucket_sum"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("bucket_start")
    obs = per.select(
        key_col, "bucket_start", "n_events", "bucket_sum",
        F.lag("bucket_start").over(w).alias("__pb"),
        F.lag("bucket_sum").over(w).alias("__pv"),
    )
    cur, pb, pv = F.col("bucket_start"), F.col("__pb"), F.col("__pv")
    x = F.explode(
        F.sequence(F.coalesce(pb + step, cur), cur, F.lit(step))
    ).alias("__x")
    rows = obs.select(key_col, "n_events", "bucket_sum", "__pb", "__pv",
                      cur.alias("__cb"), x)
    cb, xx = F.col("__cb"), F.col("__x")
    is_obs = xx == cb
    interp = F.when(is_obs, F.col("bucket_sum").cast("double")).otherwise(
        pv + (F.col("bucket_sum") - pv) * (xx - pb) / (cb - pb)
    )
    return rows.select(
        key_col,
        xx.alias("bucket_start"),
        F.when(is_obs, F.col("n_events")).otherwise(F.lit(0)).alias("n_events"),
        F.when(is_obs, F.col("bucket_sum")).alias("bucket_sum"),
        interp.alias("bucket_sum_interp"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average (recursive form,
    ``e_t = alpha*x_t + (1-alpha)*e_{t-1}``, ``e_1 = x_1``).

    The recursion is inherently sequential per key, so this is one of the
    few operators where ``applyInPandas`` is the RIGHT tool (SURVEY's custom
    operator rule (b)): Arrow-batched, one group per key, O(n) per key.  A
    pure-window formulation exists only via ``(1-alpha)**(-i)`` rescaling,
    which overflows float64 after ~7000 rows per key, so it does not
    survive 100 TB keys.  The recurrence is written out literally (``a*x +
    (1-a)*prev``) instead of ``pandas.ewm(adjust=False)`` so the float ops
    and their association match a recursive-CTE oracle bit-for-bit;
    ``pandas.ewm`` is the faster production spelling of the same math.
    Cost: one shuffle on the key (same as any per-key window), Arrow both
    ways.  Hot keys land in one group each — same caveat as every ordered
    operator; salt upstream if one key dominates.  ``value_col`` must be
    non-NULL (filter or fill first).
    """
    ties = list(tie_breakers or [])
    sort_cols = [ts_col] + ties
    a = float(alpha)

    def _one(pdf):
        import numpy as np

        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        e = np.empty_like(x)
        prev = 0.0
        for i in range(len(x)):
            prev = x[i] if i == 0 else a * x[i] + (1.0 - a) * prev
            e[i] = prev
        pdf["ewma_value"] = e
        return pdf

    # fresh StructType: .add() on df.schema would mutate the cached schema
    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField("ewma_value", T.DoubleType())])
    return df.groupBy(key_col).applyInPandas(_one, schema=out_schema)
