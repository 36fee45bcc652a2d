"""Distributed prefix scan over a total order — the building block for
global running aggregates (cumulative counts/ranks, running max) WITHOUT a
single-partition window.

A global ``Window.orderBy(col)`` funnels every row through ONE partition —
the classic scale cliff (our plan audit flags it as
NONSCALAR_SINGLE_PARTITION).  The classic fix is a two-level scan:

1. the caller reduces to ONE row per distinct order value (a normal
   shuffled aggregate), so this operator only ever scans the distinct-value
   relation, not the data;
2. values are binned into ``num_bins`` fixed value ranges (bounds from one
   min/max aggregate) — bin assignment is pure arithmetic, no sampling, so
   it is deterministic across jobs (unlike ``repartitionByRange``, whose
   sampled boundaries can differ between the branches of a DAG);
3. per-bin partial aggregates — a bounded, metadata-scale table (<=
   ``num_bins`` rows) — come to the driver, which computes the cross-bin
   prefix and broadcasts it back (the same O(partitions) driver pattern AQE
   uses for its statistics, and the catalog uses for zonemaps);
4. the within-bin running aggregate is a window PARTITIONED by bin —
   parallel across bins, never a global exchange.

Used by ``relational.pareto_frontier_2d`` (running max over cost) and
``zorder.with_zorder`` (exact rank normalization via running count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_agg(
    per_value: DataFrame,
    order_col: str,
    value_col: str,
    agg: str = "sum",
    num_bins: int = 256,
) -> DataFrame:
    """Add ``__below`` / ``__upto`` columns to a one-row-per-distinct-value
    relation: the running ``agg`` (``sum`` or ``max``) of ``value_col`` over
    all rows with strictly smaller / smaller-or-equal ``order_col``.

    ``per_value`` MUST be unique on ``order_col`` (pre-aggregate ties) and
    ``order_col`` must be non-NULL numeric/timestamp/date (orderable by
    value; anything whose cast to double is NULL raises ValueError).  For
    ``sum``, ``__below``/``__upto`` are 0-based (empty prefix = 0); for
    ``max`` the empty prefix is NULL.

    Cost contract (ADVICE r12 #4): the input is eagerly checkpointed, so
    every call materializes O(distinct order values) rows into executor
    storage - that IS the relation's size under the uniqueness contract
    above, and callers consuming it 2-4x (zorder cluster/pareto) is what
    the checkpoint pays for.  Callers with a near-unique high-cardinality
    order column (e.g. z-ordering a raw timestamp) should pre-bucket it
    rather than feed ~n distinct values through here.
    """
    if agg not in ("sum", "max"):
        raise ValueError(f"agg must be sum|max, got {agg!r}")
    fn = F.sum if agg == "sum" else F.max
    spark = per_value.sparkSession

    # Dates cast to double only via timestamp; everything else orderable-by-
    # value (numeric / timestamp / bool) casts directly.  Strings do NOT -
    # their cast is NULL and is rejected below rather than binned as garbage.
    if per_value.schema[order_col].dataType.simpleString() == "date":
        oc = F.col(order_col).cast("timestamp").cast("double")
    else:
        oc = F.col(order_col).cast("double")

    # materialized ONCE (r12): this relation is referenced by the min/max
    # probe, the per-bin partials, and the within-bin window - lazily it
    # would re-execute (typically a full aggregate over the caller's DATA)
    # three times, and the caller's join-back a fourth.  The checkpoint is
    # O(distinct order values), which the contract already bounds.  The
    # bin-bounds probe (min/max/null-count) RIDES the checkpoint job via
    # observe() (r13) - previously a separate .first() job per call.
    from pyspark.sql import Observation

    obs = Observation()
    per_value = (
        per_value.observe(
            obs, F.min(oc).alias("lo"), F.max(oc).alias("hi"),
            F.count(F.when(oc.isNull(), 1)).alias("n_null"),
            F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    m = obs.get
    lo, hi, n_null, n_rows = m["lo"], m["hi"], m["n_null"], m["n_rows"]
    if n_rows == 0:  # genuinely empty input: typed empty-prefix columns
        val_t = per_value.schema[value_col].dataType.simpleString()
        empty = F.lit(0).cast(val_t) if agg == "sum" else F.lit(None).cast(val_t)
        below0 = empty
        upto0 = F.col(value_col) if agg == "max" else empty + F.col(value_col)
        return (
            per_value.withColumn("__below", below0).withColumn("__upto", upto0)
        )
    if n_null:
        raise ValueError(
            f"running_agg: order column {order_col!r} must be numeric/"
            f"timestamp/date-valued and non-NULL (cast to double produced "
            f"{n_null} NULLs in {n_rows} rows)"
        )
    width = (float(hi) - float(lo)) / num_bins or 1.0
    bin_col = F.least(
        F.floor((oc - F.lit(float(lo))) / F.lit(width)), F.lit(num_bins - 1)
    ).cast("int")
    binned = per_value.withColumn("__bin", bin_col)

    bin_aggs = {
        b: v for b, v in binned.groupBy("__bin").agg(fn(value_col)).collect()
    }
    prior, run = {}, None
    for b in range(num_bins):
        prior[b] = run
        if b in bin_aggs:
            v = bin_aggs[b]
            if run is None:
                run = v
            else:
                run = run + v if agg == "sum" else max(run, v)
    val_type = per_value.schema[value_col].dataType.simpleString()
    prefix_df = spark.createDataFrame(
        [(b, prior[b]) for b in range(num_bins)],
        schema=f"__bin int, __prior {val_type}",
    )

    wb = Window.partitionBy("__bin").orderBy(F.col(order_col).asc())
    incl = fn(value_col).over(wb.rowsBetween(Window.unboundedPreceding, 0))
    excl = fn(value_col).over(wb.rowsBetween(Window.unboundedPreceding, -1))
    if agg == "sum":
        zero = F.lit(0).cast(val_type)
        below = F.coalesce(excl, zero) + F.coalesce(F.col("__prior"), zero)
        upto = incl + F.coalesce(F.col("__prior"), zero)
    else:
        below = F.greatest(excl, F.col("__prior"))
        upto = F.greatest(incl, F.col("__prior"))
    return (
        binned.join(F.broadcast(prefix_df), "__bin")
        .withColumn("__below", below)
        .withColumn("__upto", upto)
        .drop("__bin", "__prior")
    )
