"""Connected components over pair graphs - transitive duplicate clustering.

Pair-based dedup (minhash/simhash/ngram) emits edges; turning edges into
duplicate GROUPS (a~b, b~c => {a,b,c}) needs connected components.  This is
iterative min-label propagation on DataFrames:

- each node starts labeled with itself;
- every iteration, a node takes the min label among itself and its
  neighbors (one shuffle per iteration);
- stops when no label changes (diameter-bounded; dedup clusters are tiny,
  so convergence is 2-4 iterations in practice).

Lineage is cut each iteration with localCheckpoint - without it the plan
doubles every round and the job dies on plan explosion long before data
size matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable.  Raises if not converged in max_iterations."""
    # no .distinct() on the symmetrized edges (round 6): min-label
    # propagation is duplicate-insensitive - a repeated (a,b) row only adds
    # input to the min() aggregate, whose map-side combiner absorbs it -
    # so deduplicating here pays a full extra shuffle of the edge set for
    # nothing.  Callers emitting candidate pairs already dedupe when their
    # generator can produce repeats (minhash bands -> .distinct()).
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

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
