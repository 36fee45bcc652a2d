"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Rotation note (round 6): the driver verifies the first 50 entries of
``queries()`` in iteration order.  After round 5, 147/148 queries are
driver-green at least once; round 6 fronts (a) ``higher_order_fns`` -
the one never-green row, its DuckDB oracle now COALESCEs the empty-list
NULL that Spark's ``array_join`` renders as ``''`` - (b) every query
whose implementation changed in round 6 (arrow_udf cosine/assign
kernels, connected-components distinct removal, persisted LSH bucket-cap
aggregate), then (c) fills the window oldest-driver-evidence-first (the
10 remaining r2 rows, then 33 r3 rows).  Every query stays registered;
only iteration order changes.  All 148 remain covered by the local
harness (tests/test_correctness.py, which since round 6 defaults to the
driver's sf0.01); scripts/driver_sim.py gates rotation slots on a
vanilla-session pass, run via scripts/gate.sh as the round's last act
and committed as GATE_r6.log.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY  # noqa: E402

# Round-6 driver-verification priority (VERDICT r5 asks #1/#8): tier 1 =
# ``higher_order_fns``, red r1-r5 (the oracle now COALESCEs DuckDB's
# empty-list NULL to match Spark's array_join '' - root cause in VERDICT
# r5 "What's wrong" #1); tier 2 = queries over round-6 implementation
# changes (arrow_udf cosine/assign kernels in similarity.py, the
# connected-components distinct removal in graph.py, the persisted LSH
# bucket-cap aggregate in dedup.py); tier 3 fills the 50-slot window
# oldest-driver-evidence-first (all 10 remaining r2 rows, then 33 of the
# 43 r3 rows alphabetically; the 8 r3 leftovers rotate in r7).
# Everything else follows in registry order.  Gate discipline (VERDICT r5
# ask #2): this window holds slots only if scripts/driver_sim.py - run at
# sf0.01 by scripts/gate.sh, whose stdout is committed as GATE_r6.log -
# exits green as the round's LAST act.
_PRIORITY = [
    # tier 1: the only never-green row -> cumulative 148/148 when green
    "higher_order_fns",
    # tier 2: round-6 implementation changes (arrow kernels, CC, LSH cap)
    # and the two new PQ queries (never driver-checked before)
    "pq_topk", "pq_code_hist", "ivfpq_topk", "ann_recall",
    "semantic_dedup", "semantic_dedup_exact", "ivf_topk",
    "ivf_assign_incremental", "minhash_lsh", "dedup_transitive",
    # tier 3a: last green in r2
    "string_functions", "template_routing", "time_partition_assign",
    "topk_orders", "topk_per_group", "unix_epoch", "window_cumulative",
    "window_lag_lead", "window_range_frame", "window_rank_suite",
    # tier 3b: last green in r3 (first 33 alphabetically)
    "ann_lsh_topk", "blob_meta", "boilerplate_frac", "chunk_documents",
    "decontaminate", "dedup_incremental", "det_sample", "doc_fingerprint",
    "doc_logprob", "doc_rolling_fp", "embedding_dups", "embedding_topk",
    "filter_pipeline", "frame_sample", "heavy_hitter_tokens",
    "heavy_hitters_by_lang", "lang_id", "lang_quality_calibrated",
    "minhash_incremental", "minhash_signature", "ngram_jaccard",
    "pack_sequences", "pii_redact", "profile_documents",
    "q10_returned_items", "q13_customer_distribution",
    "q19_discounted_parts", "q21_waiting_supplier", "q22_dormant_customers",
    "repetition_profile", "scd2_users", "shard_assign", "simhash32_sig",
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
