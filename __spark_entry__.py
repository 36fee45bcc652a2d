"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Rotation note (round 4): the driver verifies the first 50 entries of
``queries()`` in iteration order.  Rounds 1-3 covered 100 distinct queries;
round 4 fronts the 37 still-unchecked ones, the two r3 hash-red rows whose
oracle SUM typing was fixed this round, and the queries whose
implementation or oracle changed in round 4.  Every query stays
registered; only iteration order changes.  All remain covered by the
local DuckDB-oracle harness (tests/test_correctness.py), which since
round 4 canonicalizes the DuckDB side through pandas/Arrow exactly like
the driver (so HUGEINT-vs-BIGINT class artifacts are caught locally).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY  # noqa: E402

# Round-4 driver-verification priority (VERDICT r3 "Next round" items 1-2):
# the driver checks the first 50 entries of queries(), so the front block is
# the 37 queries with NO driver CORRECTNESS row after rounds 1-3 (green in
# the local oracle harness, never driver-verified), followed by the two
# round-3 hash-red rows whose oracle SUM types were fixed this round
# (dedup_exact / corpus_stats), then re-verify candidates whose query or
# oracle changed in round 4 (ivf_topk / semantic_dedup upgraded from
# rows-only to exact seeded-Lloyd's oracles; minhash_lsh cap default;
# weighted_sample ln(0) clamp) and round-4 additions.  Everything already
# driver-green in r1-r3 follows in registry order.
_PRIORITY = [
    # tier 1: driver-unchecked after r1-r3 (35 from the r3 tier-2 list ...)
    "interp_gapfill", "pareto_parts", "cdc_snapshot_at", "ewma_user_value",
    "fuzzy_customer_names", "regr_value_trend", "zscore_anomalies",
    "funnel_steps", "cohort_retention",
    "asof_join_events", "range_join_sessions", "rollup_hypertable",
    "zorder_cluster", "sketch_suite", "pivot_priority", "unpivot_measures",
    "agg_extras", "bitwise_agg", "interval_math", "width_bucket_hist",
    "constraint_check", "window_value_suite", "conditional_exprs",
    "resample_gapfill", "rolling_hourly_stats", "string_agg_nations",
    "higher_order_fns", "from_json_typed", "udtf_tokens", "corr_stats",
    "union_by_name", "median_stats", "mad_outliers", "variant_extract",
    "recursive_chain",
    # ... plus the two late-r3 additions that missed the r3 window
    "q12_shipmode_priority", "corpus_drift",
    # tier 2: r3 hash-red on the oracle HUGEINT-vs-BIGINT artifact; oracle
    # SUMs now CAST ... AS BIGINT — keep in the first 50 to prove the fix
    "dedup_exact", "corpus_stats",
    # tier 3: round-4 re-verify (query/oracle changed this round)
    "ivf_topk", "semantic_dedup", "minhash_lsh", "weighted_sample",
    # tier 4: round-4 additions (registered as implemented this round)
    "ccnet_buckets", "source_overlap", "zipf_profile", "ngram_novelty",
    "ivf_assign_incremental", "embedding_quality", "dup_rate_by_source",
    # position 51+: misses the 50-query driver window this round - front of
    # the round-5 rotation (local-harness green at sf0.001/0.01)
    "decontaminate_bloom", "ngram_containment", "pmi_collocations",
    "char_entropy_gate",
]


def _ordered_names() -> list[str]:
    seen = [n for n in _PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(seen)]
    return seen + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aliyun_maxcompute_data_collectors_spark.queries import q1_pricing_summary
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops,
    which the driver records as rows-only checks)."""
    return {
        name: REGISTRY[name][1]
        for name in _ordered_names()
        if REGISTRY[name][1] is not None
    }
