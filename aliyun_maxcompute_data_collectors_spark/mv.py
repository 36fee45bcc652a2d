"""Incremental materialized-view maintenance over snapshot tables:
a grouped-aggregate view whose refresh cost is proportional to the
CHANGE-DATA delta (snapshots.changes), never the source table.

Reference parity: the reference keeps downstream aggregates fresh by
re-running batch jobs; this composes two engine layers it already has -
the snapshot CDF read (snapshots.py changes(): append ranges are a
metadata-only new-files read) and mergeable partial aggregates
(operators/incremental.py's monoid idea, extended here with DELETE
handling) - into the lakehouse MV-refresh shape (Delta Live
Tables / Materialize-style incremental view maintenance).

Two refresh strategies, chosen from the aggregate kinds:

- MERGE (all aggregates subtractable: count/sum/avg): the delta rows
  fold into per-key signed partials (insert = +1, delete = -1) and a
  null-safe full-outer join updates the state.  Cost: one agg over the
  delta + one key-join against the state - at 100 TB this is the only
  viable shape for high-churn fact tables.  Group liveness rides a
  hidden row count (a key whose rows all disappear leaves the view,
  exactly like a re-aggregate); SQL null semantics ride hidden non-null
  counts (a group whose every value is NULL reports NULL, not 0).
- RESCOPE (any min/max present - deletes are not subtractable there):
  keys touched by the delta are recomputed from the CURRENT snapshot
  (semi-join pruned scan); untouched keys pass through by anti-join.
  Cost ∝ affected keys' data, still never a full re-aggregate unless
  every key moved.

The state itself lives in a snapshot table, committed with an
``mv-refresh:base=<v>`` operation tag - state data and the
base-version watermark move in ONE atomic manifest commit, so a crash
between "compute" and "record" cannot desynchronize them, and the
state table's own history gives MV time travel for free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.snapshots import SnapshotError, SnapshotTable

_SUBTRACTABLE = {"count", "sum", "avg"}
_KINDS = _SUBTRACTABLE | {"min", "max"}


class MaterializedAggView:
    """A grouped-aggregate view over a :class:`SnapshotTable`.

    ``aggs`` maps output column -> (kind, sql_expr); kinds: ``count``
    (rows; expr ignored), ``sum``/``avg``/``min``/``max`` over the SQL
    expression.  ``init`` creates the state table; ``refresh()`` folds
    committed source changes in; ``read()`` returns the finalized view.
    """

    def __init__(self, spark: SparkSession, source: SnapshotTable,
                 state_path: str, keys: list[str],
                 aggs: dict[str, tuple[str, str]]):
        for out, (kind, _e) in aggs.items():
            if kind not in _KINDS:
                raise ValueError(f"mv: unsupported aggregate kind {kind!r} "
                                 f"for {out!r} (want {sorted(_KINDS)})")
        self.spark = spark
        self.source = source
        self.keys = list(keys)
        self.aggs = dict(aggs)
        self.state = SnapshotTable(spark, state_path)
        self._subtractable = all(k in _SUBTRACTABLE
                                 for k, _ in aggs.values())

    # -- lifecycle ---------------------------------------------------------
    @classmethod
    def init(cls, spark: SparkSession, source: SnapshotTable,
             state_path: str, keys: list[str],
             aggs: dict[str, tuple[str, str]]) -> "MaterializedAggView":
        SnapshotTable.init(spark, state_path)
        return cls(spark, source, state_path, keys, aggs)

    def base_version(self) -> int:
        """Source version the state reflects (1 = empty init: nothing
        folded in yet), read from the state table's own commit log."""
        for v in reversed(self.state.versions()):
            op = v["operation"]
            if op.startswith("mv-refresh:base="):
                return int(op.split("=", 1)[1])
        return 1

    # -- state schema helpers ----------------------------------------------
    def _state_aggs(self, rows_weight) -> list:
        """Aggregate expressions producing the internal state columns from
        rows weighted by ``rows_weight`` (+1 plain rows, signed for
        deltas)."""
        cols = [F.sum(rows_weight).cast("long").alias("__n")]
        for out, (kind, expr) in self.aggs.items():
            e = F.expr(expr) if kind != "count" else None
            if kind == "count":
                cols.append(F.sum(rows_weight).cast("long").alias(out))
            elif kind in ("sum", "avg"):
                cols.append(F.sum(
                    F.when(e.isNotNull(), e * rows_weight)).alias(f"__s_{out}"))
                cols.append(F.sum(
                    F.when(e.isNotNull(), rows_weight).otherwise(F.lit(0)))
                    .cast("long").alias(f"__nn_{out}"))
            elif kind == "min":
                cols.append(F.min(e).alias(out))
            else:
                cols.append(F.max(e).alias(out))
        return cols

    def _state_cols(self) -> list[str]:
        cols = ["__n"]
        for out, (kind, _e) in self.aggs.items():
            if kind in ("sum", "avg"):
                cols += [f"__s_{out}", f"__nn_{out}"]
            else:
                cols.append(out)
        return cols

    def _finalize(self, state: DataFrame) -> DataFrame:
        outs = []
        for out, (kind, _e) in self.aggs.items():
            if kind in ("count", "min", "max"):
                outs.append(F.col(out).alias(out))
            elif kind == "sum":
                outs.append(F.when(F.col(f"__nn_{out}") > 0,
                                   F.col(f"__s_{out}")).alias(out))
            else:  # avg
                outs.append(F.when(
                    F.col(f"__nn_{out}") > 0,
                    F.col(f"__s_{out}") / F.col(f"__nn_{out}")).alias(out))
        return state.select(*self.keys, *outs)

    # -- refresh -----------------------------------------------------------
    def refresh(self) -> tuple[str, int]:
        """Fold all source commits since the last refresh into the state;
        returns (strategy, new_base_version).  No-op when already
        current ('noop')."""
        base = self.base_version()
        target = self.source.current_version()
        if target == base:
            return ("noop", base)
        delta = self.source.changes(base, target)
        old = (self.state.read() if self.state.manifest()["files"]
               else None)
        if self._subtractable:
            strategy = "merge"
            sign = F.when(F.col("_change_type") == "insert",
                          F.lit(1)).otherwise(F.lit(-1))
            d = delta.groupBy(*self.keys).agg(*self._state_aggs(sign))
            new = d if old is None else self._merge(old, d)
        else:
            strategy = "rescope"
            touched = delta.select(*self.keys).distinct()

            # null-safe semi/anti: groupBy treats NULL as a key value,
            # plain joins would drop it
            def cond(left: str, right: str):
                return reduce(
                    lambda x, y: x & y,
                    [F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
                     for k in self.keys])

            cur = self.source.read(target)
            t = touched.alias("t")
            recomputed = (cur.alias("c")
                          .join(t, cond("c", "t"), "left_semi")
                          .groupBy(*self.keys)
                          .agg(*self._state_aggs(F.lit(1))))
            if old is None:
                new = recomputed
            else:
                kept = old.alias("o").join(
                    t, cond("o", "t"), "left_anti")
                new = kept.unionByName(recomputed)
        new = new.where(F.col("__n") > 0) \
            .select(*self.keys, *self._state_cols())
        self._commit_state(new, target)
        return (strategy, target)

    def _merge(self, old: DataFrame, d: DataFrame) -> DataFrame:
        cond = reduce(lambda x, y: x & y,
                      [old[k].eqNullSafe(d[k]) for k in self.keys])
        j = old.alias("o").join(d.alias("d"), cond, "full_outer")
        keysel = [F.coalesce(old[k], d[k]).alias(k) for k in self.keys]
        merged = []
        for c in self._state_cols():
            o, n = old[c], d[c]
            if c == "__n" or c.startswith("__nn_") or \
                    self.aggs.get(c, ("", ""))[0] == "count":
                merged.append((F.coalesce(o, F.lit(0))
                               + F.coalesce(n, F.lit(0))).alias(c))
            else:  # __s_* sums: NULL + NULL must stay NULL (all-null group)
                merged.append(F.when(
                    o.isNull() & n.isNull(), F.lit(None)).otherwise(
                    F.coalesce(o, F.lit(0)) + F.coalesce(n, F.lit(0)))
                    .alias(c))
        return j.select(*keysel, *merged)

    def _commit_state(self, new: DataFrame, target: int) -> None:
        # read-then-overwrite is safe on snapshot tables (the input reads
        # the OLD pinned snapshot; see SnapshotTable.overwrite), and the
        # base watermark rides the SAME manifest commit
        self.state.overwrite(new, operation=f"mv-refresh:base={target}")

    # -- reads -------------------------------------------------------------
    def read(self) -> DataFrame:
        """The finalized view at its current refresh point."""
        m = self.state.manifest()
        if not m["files"]:
            raise SnapshotError("mv: state is empty - refresh() first")
        return self._finalize(self.state.read())

    def full_recompute(self) -> DataFrame:
        """Direct aggregate of the current source snapshot - the
        equivalence oracle for tests; costs a full scan by definition."""
        cur = self.source.read()
        return self._finalize(
            cur.groupBy(*self.keys).agg(*self._state_aggs(F.lit(1)))
            .where(F.col("__n") > 0))
