"""Z-order (Morton) clustering for multi-column data skipping.

A single sort column can only prune scans filtered on that column; Z-order
interleaves the bits of several columns so files/row-groups stay compact in
EVERY interleaved dimension - parquet min/max stats then skip data for
filters on any of them.  The standard lakehouse layout trick (OPTIMIZE
ZORDER BY), absent in the reference, implemented with pure built-ins.

Columns are rank-normalized to [0, 2^bits) (robust to skew/outliers,
type-agnostic for orderable types), then bit-interleaved into a single long
z-value.  The rank is EXACT percent_rank semantics ((rank-1)/(n-1), ties
share the min rank) but computed WITHOUT a global-order window: distinct
value counts + a distributed prefix scan (operators/prefixscan.py) give each
distinct value its count of strictly-smaller rows, which joins back onto the
data — three ordinary shuffles, no single-partition exchange, so the layout
job scales to the table sizes z-ordering exists for.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.prefixscan import running_agg

DEFAULT_BITS = 16  # per-column resolution; 2 cols x 16 bits -> 32-bit z-value


def _rank_codes(df: DataFrame, col: str, bits: int, n_rows: int) -> DataFrame:
    """(col, __code): each distinct value's percent_rank scaled to
    [0, 2^bits).  Formula matches percent_rank()*cap exactly: below/(n-1)
    in double, then *cap, then floor - so engines agree bit-for-bit."""
    cap = (1 << bits) - 1
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # running_agg checkpoints its input once (r12), so the distinct-count
    # aggregate scans the DATA exactly once per column - lazily it was
    # re-executed by the probe/partials/window and the rank join (3-4x)
    scanned = running_agg(counts, col, "__cnt", agg="sum")
    if n_rows <= 1:
        code = F.lit(0).cast("long")
    else:
        code = F.least(
            F.floor(
                F.col("__below").cast("double")
                / F.lit(float(n_rows - 1))
                * F.lit(float(cap))
            ),
            F.lit(cap).cast("long"),
        )
    return scanned.select(col, code.alias("__code"))


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Round-robin bit interleave of n longs: bit j of column i lands at
    position j*n + i (column 0 gets the least-significant slot of each
    round, preserving the classic 2-column Morton layout)."""
    n = len(ranks)
    parts = []
    for i, col in enumerate(ranks):
        for j in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftrightunsigned(col, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    out_col: str = "__z__",
    n_rows: int | None = None,
) -> DataFrame:
    """``df`` plus a z-value column over 2+ numeric/timestamp/date columns
    (``n_cols * bits`` must fit in 63 bits — lower ``bits`` for wide sets).

    NULLs are kept: a NULL in a z-order column ranks as the smallest value
    (code 0), so the output has exactly the input's rows — clustering must
    never drop data.  String columns are rejected by the prefix scan
    (``running_agg`` raises) rather than silently mis-binned.

    Cost: per column one distinct-count aggregate + prefix scan over the
    DISTINCT values, then one shuffle join back on the value.  All exchanges
    are keyed — nothing global."""
    if len(cols) < 2:
        raise ValueError("with_zorder needs at least 2 columns")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long; "
                         "reduce bits")
    # callers that already know the exact row count (snapshot cluster():
    # the manifest tracks logical rows) pass it and skip a full count pass
    n = df.count() if n_rows is None else n_rows
    out = df
    rank_cols = []
    for i, c in enumerate(cols):
        rc = _rank_codes(df, c, bits, n).withColumnRenamed("__code", f"__r{i}")
        out = (
            out.join(rc, c, "left")
            .withColumn(f"__r{i}", F.coalesce(F.col(f"__r{i}"), F.lit(0)))
        )
        rank_cols.append(f"__r{i}")
    z = _interleave([F.col(c) for c in rank_cols], bits)
    return out.withColumn(out_col, z).drop(*rank_cols)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
    n_rows: int | None = None,
) -> DataFrame:
    """Cluster rows by z-value: range-partition on the z-value into
    ``n_files`` partitions and sort within - each output file covers a
    compact hyper-rectangle of the column space, so min/max stats prune on
    either column."""
    z = with_zorder(df, cols, bits, n_rows=n_rows)
    return (
        z.repartitionByRange(n_files, F.col("__z__"))
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )


def skipping_effectiveness(
    df: DataFrame, cols: list[str], predicate_col: str, lo, hi, n_files: int = 32
) -> dict:
    """Diagnostic: fraction of z-ordered partitions whose [min,max] of
    ``predicate_col`` overlaps [lo,hi] - the proxy for how many files a
    filtered scan would touch (1.0 = no skipping)."""
    z = zorder_by(df, cols, n_files)
    stats = (
        z.withColumn("__pid__", F.spark_partition_id())
        .groupBy("__pid__")
        .agg(F.min(predicate_col).alias("lo"), F.max(predicate_col).alias("hi"))
        .collect()
    )
    total = len(stats)
    touched = sum(1 for r in stats if not (r["hi"] < lo or r["lo"] > hi))
    return {"partitions": total, "touched": touched,
            "fraction": touched / total if total else 0.0}
