"""Skew mitigation: salting for hot keys.

The reference sidesteps skew entirely (splits are size-based, compute is the
host engine's problem).  At 100 TB, skewed join/agg keys are the #1 cause of
straggler tasks; this module provides the two standard mitigations as
reusable operators, complementing AQE's runtime skew-join splitting
(spark.sql.adaptive.skewJoin, enabled by our session factory):

- salted aggregation: two-phase agg via a random-ish salt column;
- salted broadcast-free join: replicate the small side per salt.

Salting uses a deterministic hash-based salt (pmod(xxhash64(row_id), n)) so
runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def with_salt(df: DataFrame, n_salts: int, deterministic_cols: list[str] | None = None) -> DataFrame:
    """Attach a salt in [0, n_salts).  With ``deterministic_cols`` the salt is
    stable across runs (hash of those columns); otherwise per-row monotonic id
    is used (stable within a single materialization)."""
    if deterministic_cols:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in deterministic_cols]), F.lit(n_salts))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    return df.withColumn(SALT_COL, salt.cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs``: out_col -> (in_col, kind) with kind in {sum,count,min,max}.
    Phase 1 aggregates by (key, salt) - spreading a hot key over n_salts
    reducers; phase 2 combines partials by key.  Only algebraic aggregates
    are offered (the ones that decompose)."""
    partial_exprs = []
    final_exprs = []
    for out, (col, kind) in aggs.items():
        p = f"__p_{out}"
        if kind == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif kind == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate kind {kind!r}")
    salted = with_salt(df, n_salts, deterministic_cols=None)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when the small side is too large to broadcast and
    the big side has hot keys: the big side gets a random salt, the small
    side is replicated once per salt value, and the join key becomes
    (key, salt) - hot keys spread over n_salts tasks.

    Cost: small side shuffled n_salts times - use only when a handful of keys
    dominate; otherwise rely on AQE skew-join.

    Only inner/left joins are salt-safe: an outer-preserved SMALL side emits
    one row per unmatched replica (n_salts duplicates)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): the "
            "replicated small side would duplicate unmatched rows under "
            "right/full outer semantics")
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias(SALT_COL)
    small_rep = small.select("*", salts)
    big_salted = with_salt(big, n_salts)
    out = big_salted.join(small_rep, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def key_histogram(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Hot-key diagnostic: row count per key, heaviest first - run this
    before deciding between broadcast / salting / AQE."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), *[F.col(k) for k in keys])
        .limit(top)
    )
