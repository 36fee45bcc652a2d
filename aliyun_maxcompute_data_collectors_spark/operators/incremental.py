"""Incremental aggregate maintenance via mergeable partial states.

The 100 TB pattern behind "refresh the dashboard without rescanning the
year": keep per-group PARTIAL aggregate state (sum / count / min / max —
the commutative-monoid aggregates), compute the same partials for each new
batch/partition, and MERGE states instead of recomputing.  AVG and friends
finalize from (sum, count) at read time.  This is exactly what Spark's own
partial_/merge_ aggregate physical nodes do within a query; here the state
is persisted across queries (a materialized-view delta refresh).

Merging is a union of two already-aggregated (small) relations + one
re-aggregate on the group key — cost proportional to GROUPS, not data.
Non-mergeable aggregates (count distinct, exact percentiles) need sketches
(HLL / KLL) or a recompute; that distinction is the point of the API.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge function per aggregate kind: how two partial states combine
_MERGE = {
    "sum": F.sum,
    "count": F.sum,   # counts merge by summing
    "min": F.min,
    "max": F.max,
    # approximate distinct: Apache-DataSketches HLL binary states union
    # with accuracy preserved (union is not bit-identical to one-shot
    # sketching, but stays inside the sketch's error bounds) - THE
    # mergeable stand-in for the non-mergeable COUNT DISTINCT; finalize
    # with hll_sketch_estimate (see finalize_sketches)
    "approx_distinct": F.hll_union_agg,
}


def partial_agg(
    df: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Per-key partial state: ``specs`` maps output column -> (kind, input
    column), kind in sum|count|min|max|approx_distinct.  ``count`` counts
    non-NULL inputs (use a literal column for COUNT(*));
    ``approx_distinct`` keeps an HLL sketch (binary) as the state."""
    aggs = []
    for out, (kind, col) in specs.items():
        if kind not in _MERGE:
            raise ValueError(f"non-mergeable aggregate kind {kind!r}")
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
              "approx_distinct": F.hll_sketch_agg}[kind]
        aggs.append(fn(F.col(col)).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def finalize_sketches(
    partials: DataFrame,
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Resolve sketch-state columns to readable values: HLL states become
    long estimates (other columns pass through unchanged)."""
    cols = []
    for c in partials.columns:
        if c in specs and specs[c][0] == "approx_distinct":
            cols.append(F.hll_sketch_estimate(F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return partials.select(*cols)


def merge_partials(
    partials: list[DataFrame],
    keys: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Combine partial states (outputs of :func:`partial_agg` over disjoint
    slices): union + one re-aggregate with each column's merge function."""
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    aggs = [
        _MERGE[kind](F.col(out)).alias(out)
        for out, (kind, _col) in specs.items()
    ]
    return unioned.groupBy(*keys).agg(*aggs)
