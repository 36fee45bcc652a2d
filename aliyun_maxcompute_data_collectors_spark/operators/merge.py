"""Key-based merge (incremental reconcile).

Parity: Sqoop's MergeJob (``odps-sqoop/src/java/org/apache/sqoop/mapreduce/
MergeJob.java:53-126`` + ``MergeReducerBase.java``): old + new datasets are
co-grouped on ``--merge-key`` and the newest record per key wins.

Spark-first: a single window dedup - one shuffle on the key, no co-group
materialization.  At 100 TB the shuffle partitions on the merge key; AQE
handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RN = "__merge_rn__"


def newest_wins(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Keep the newest row per key; ``order_by`` columns rank recency
    ascending (latest value wins).  Deterministic given a unique tiebreak in
    ``order_by``."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    matched: list[tuple[str | None, str | dict[str, str]]] | None = None,
    not_matched: tuple[str | None, str | dict[str, str]] | None = None,
    not_matched_by_source: list[tuple[str | None, str | dict[str, str]]] | None = None,
    target_alias: str = "t",
    source_alias: str = "s",
    validate_cardinality: bool = True,
) -> DataFrame:
    """ANSI ``MERGE INTO`` semantics as one DataFrame pass; returns the new
    target snapshot (the caller persists it - read-merge-overwrite on parquet,
    a transactional lakehouse format would commit it atomically).

    - ``on``: SQL join condition over ``target_alias``/``source_alias``.
    - ``matched``: ordered WHEN MATCHED clauses ``(condition | None, action)``
      where action is the string ``"delete"`` or a ``{col: sql_expr}`` SET
      map; for each matched row the FIRST clause whose condition holds
      applies (ANSI evaluation order), later ones are ignored.
    - ``not_matched``: WHEN NOT MATCHED ``(condition | None, inserts)`` where
      inserts is ``{col: sql_expr}`` or ``"*"`` (insert source columns by
      name).  Unlisted target columns become NULL.
    - ``not_matched_by_source``: ordered WHEN NOT MATCHED BY SOURCE clauses
      (target rows with no source match): ``"delete"`` or a SET map over
      TARGET columns only (no source columns exist for these rows).
    - ``validate_cardinality``: raise if one target row matches >1 source row
      (ANSI requires this; silently applying an arbitrary match corrupts
      data).  Costs one narrow aggregation over the join's matched rows.

    Scale shape: ONE join on the merge keys (full-outer only when an INSERT
    clause exists, else left-outer - unmatched source rows would be dropped
    anyway), actions resolved per-row with CASE - no per-clause passes, no
    driver loops.  Join skew is AQE-handled; the snapshot shuffle is the
    floor any MERGE pays.

    Reference parity: generalizes Sqoop MergeJob (J2) and the OGG CDC apply
    (ST4, insert/update/delete ops) into the one statement both map to
    (SURVEY 2.4 J2 "or DSv2 MERGE INTO")."""
    matched = list(matched or [])
    t_ex, s_ex, tid = "__t_exists__", "__s_exists__", "__tid__"
    out_schema = target.schema
    t = (
        target.withColumn(t_ex, F.lit(1))
        .withColumn(tid, F.monotonically_increasing_id())
        .alias(target_alias)
    )
    s = source.withColumn(s_ex, F.lit(1)).alias(source_alias)
    how = "full_outer" if not_matched is not None else "left_outer"
    j = t.join(s, F.expr(on), how)
    if validate_cardinality:
        # one (tid) aggregation; reused rows make the join worth checkpointing
        j = j.localCheckpoint(eager=True)
        dup = (
            j.where(F.col(t_ex).isNotNull() & F.col(s_ex).isNotNull())
            .groupBy(tid).agg(F.count(F.lit(1)).alias("__n__"))
            .where(F.col("__n__") > 1)
        )
        if dup.take(1):
            raise ValueError(
                "MERGE cardinality violation: a target row matches multiple "
                "source rows; make the ON condition key-unique or "
                "pre-aggregate the source (e.g. newest_wins)")

    is_m = F.col(t_ex).isNotNull() & F.col(s_ex).isNotNull()
    t_only = F.col(t_ex).isNotNull() & F.col(s_ex).isNull()
    s_only = F.col(t_ex).isNull() & F.col(s_ex).isNotNull()

    # action per row: first applicable clause wins ("U<i>" update, "D" delete,
    # "I" insert, "K" keep, "X" drop)
    act = None
    for i, (cond, action) in enumerate(matched):
        branch = is_m if cond is None else is_m & F.expr(cond)
        code = "D" if (isinstance(action, str) and action.lower() == "delete") else f"U{i}"
        act = act.when(branch, code) if act is not None else F.when(branch, F.lit(code))
    keep_m = F.when(is_m, "K")
    act = act.when(is_m, "K") if act is not None else keep_m
    for i, (cond, action) in enumerate(not_matched_by_source or []):
        branch = t_only if cond is None else t_only & F.expr(cond)
        code = ("D" if (isinstance(action, str) and action.lower() == "delete")
                else f"S{i}")
        act = act.when(branch, code)
    act = act.when(t_only, "K")
    if not_matched is not None:
        icond, _ = not_matched
        branch = s_only if icond is None else s_only & F.expr(icond)
        act = act.when(branch, "I")
    act = act.otherwise("X")
    j = j.withColumn("__act__", act).where(~F.col("__act__").isin("D", "X"))

    def q(alias: str, c: str) -> str:
        return f"{alias}.`{c}`"

    insert_map: dict[str, str] = {}
    if not_matched is not None:
        _, inserts = not_matched
        if inserts == "*":
            src_cols = set(source.columns)
            missing = [f.name for f in out_schema.fields if f.name not in src_cols]
            if missing:
                raise ValueError(f"INSERT *: source lacks target columns {missing}")
            insert_map = {f.name: q(source_alias, f.name) for f in out_schema.fields}
        else:
            insert_map = dict(inserts)

    out_cols = []
    for f in out_schema.fields:
        c = F.expr(q(target_alias, f.name))
        for i, (_, action) in enumerate(matched):
            if isinstance(action, dict) and f.name in action:
                c = F.when(F.col("__act__") == f"U{i}", F.expr(action[f.name])).otherwise(c)
        for i, (_, action) in enumerate(not_matched_by_source or []):
            if isinstance(action, dict) and f.name in action:
                c = F.when(F.col("__act__") == f"S{i}", F.expr(action[f.name])).otherwise(c)
        if not_matched is not None:
            ins = F.expr(insert_map[f.name]) if f.name in insert_map else F.lit(None)
            c = F.when(F.col("__act__") == "I", ins).otherwise(c)
        out_cols.append(c.cast(f.dataType).alias(f.name))
    return j.select(*out_cols)


def merge_datasets(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """Sqoop merge: union old+new, newest per key wins.  ``new`` rows beat
    ``old`` rows on order ties via a provenance column (matching MergeJob,
    where the new dataset shadows the old)."""
    prov = "__merge_src__"
    u = old.withColumn(prov, F.lit(0)).unionByName(new.withColumn(prov, F.lit(1)))
    return newest_wins(u, keys, order_by + [prov]).drop(prov)
