"""Connected components over pair graphs - transitive duplicate clustering.

Pair-based dedup (minhash/simhash/ngram) emits edges; turning edges into
duplicate GROUPS (a~b, b~c => {a,b,c}) needs connected components.  Two
execution strategies, both producing the identical (node, min-reachable-id)
fixed point:

- SMALL EDGE SETS (the overwhelmingly common dedup shape - near-duplicate
  pairs are a sliver of the corpus): the edge list is collected once and
  solved with driver-side union-find.  The same bounded-smallness reasoning
  broadcast joins already apply: if the edges fit comfortably in one
  broadcast relation, shipping them to the driver once is strictly cheaper
  than 2-5 distributed label-propagation rounds of 3 shuffles each.  Gated
  on an exact edge count (riding the checkpoint job via observe(), not an
  estimate) and on value types whose Python ordering provably matches
  Spark's (int/str); anything else falls through to the distributed path.
- LARGE EDGE SETS: iterative min-label propagation on DataFrames - each
  iteration a node takes the min label among itself and its neighbors (one
  shuffle per iteration), stopping when no label changes (diameter-bounded).

The edge projection is checkpointed ONCE up front (r13): the prior shape
checkpointed the symmetrized union, which re-executed the caller's pair
computation TWICE inside one job (both union branches scan the same
upstream join) - for semantic_dedup the pair cosine join is the dominant
cost of the whole query, so this alone halves its heavy phase.  The
symmetrized view is rebuilt lazily from the checkpoint (two cheap reads of
materialized partitions per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Max edges solved driver-side.  300k edges collect to a few tens of MB
# (well under broadcast-relation scale); past it, label propagation runs
# distributed.  Override for clusters with bigger driver heads via
# graph.CC_DRIVER_MAX_EDGES before calling.
CC_DRIVER_MAX_EDGES = 300_000


def _driver_components(rows) -> list[tuple] | None:
    """Union-find over collected edges: (node, min reachable id) for every
    node appearing in the edges - the exact fixed point min-label
    propagation converges to.  Returns None when any value is not a plain
    int/str (bool excluded): for those, Python's ordering provably matches
    Spark's min()/least() (ints numerically, strings by code point /
    UTF8 binary); NULLs, floats (NaN ordering differs), Decimal, dates
    etc. keep the distributed path rather than risking a divergent min."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        for v in (a, b):
            ok = (type(v) is int or type(v) is str)
            if not ok:
                return None
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root so the final pass needs no extra relabeling order
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable.  Raises if not converged in max_iterations."""
    from pyspark.sql import Observation

    # ONE checkpoint of the bare edge projection: the caller's pair
    # computation (often an expensive similarity join) executes exactly
    # once; the edge count rides the same job via observe().
    obs_e = Observation("cc_edges")
    ecp = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_edges = int(obs_e.get["n"])

    if n_edges <= CC_DRIVER_MAX_EDGES:
        atype = ecp.schema["a"].dataType
        if atype == ecp.schema["b"].dataType:
            result = _driver_components(
                [(r[0], r[1]) for r in ecp.collect()])
            if result is not None:
                from pyspark.sql import types as T
                schema = T.StructType([
                    T.StructField("node", atype),
                    T.StructField("component", atype),
                ])
                return edges.sparkSession.createDataFrame(result, schema)

    # no .distinct() on the symmetrized edges (round 6): min-label
    # propagation is duplicate-insensitive - a repeated (a,b) row only adds
    # input to the min() aggregate, whose map-side combiner absorbs it -
    # so deduplicating here pays a full extra shuffle of the edge set for
    # nothing.  Callers emitting candidate pairs already dedupe when their
    # generator can produce repeats (minhash bands -> .distinct()).
    sym = ecp.union(ecp.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for it in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_label = F.least(F.col("component"),
                            F.coalesce("nbr_min", "component"))
        # labels only ever decrease, so "changed" is new < old - computed
        # in the same row as the update, and COUNTED BY THE CHECKPOINT
        # JOB ITSELF via observe() (r12): the eager localCheckpoint
        # already executes the plan, so riding the convergence metric on
        # it saves the separate count() job every iteration paid before
        obs = Observation(f"cc_chg_{it}")
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                new_label.alias("component"),
                (new_label < F.col("component")).alias("__chg"),
            )
            .observe(obs, F.count(F.when(F.col("__chg"), 1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["n"])
        labels = updated.drop("__chg")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")


def dedup_groups_transitive(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Attach ``group_id`` (component representative = min id in the group)
    to every row of ``df``; singletons are their own group.  The transitive
    upgrade of dedupe_corpus's direct-pair policy."""
    comp = connected_components(pairs, src, dst)
    return (
        df.join(comp, df[id_col] == comp.node, "left")
        .withColumn("group_id", F.coalesce("component", F.col(id_col)))
        .drop("node", "component")
    )


def keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """One survivor (min id) per transitive duplicate group."""
    grouped = dedup_groups_transitive(df, pairs, id_col)
    return grouped.where(F.col(id_col) == F.col("group_id")).drop("group_id")
