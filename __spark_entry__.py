"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Rotation note (round 12): the driver verifies the first 50 entries of
``queries()`` in iteration order.  Cumulative after r11: 182/183 rows
hash-green at least once (bpe_merges rows-only by design); evidence
histogram r8x35 / r9x47 / r10x50 / r11x50 (recomputed from the raw
artifacts this round).  Round 12 fronts (a) the THREE new rows with zero
driver evidence - snapshot_mor_unmatched (WHEN NOT MATCHED BY SOURCE
resolved to deletion-vector positions, VERDICT r11 missing #2) and
snapshot_dv_heavy_read (~1e5 accumulated DV positions: the anti-join
read tax + compact payoff, VERDICT r11 ask #6), and snapshot_mirror
(full sync via WHEN NOT MATCHED BY SOURCE under MOR with a diff-only
update clause); then (b) ALL 35 rows
whose newest evidence is r8 (after r12 nothing is older than r9, the
r11 ask #4 criterion); then (c) 12 r9-evidence rows most exposed
to this round's snapshots/pyds rewrites (the regex-free
_norm_meta_path every DV scan now rides, the added_dvs change-feed
planning, the merge/lock changes).  That fills the window at exactly
50.  The remaining 35 r9-evidence rows lead the tail (next round's
rotation pool); bpe_merges stays rows-only and settled.  Every query
stays registered; only iteration order changes.  All queries remain
covered by the local harness (tests/test_correctness.py at the
driver's sf0.01); scripts/driver_sim.py gates rotation slots on a
vanilla-session pass - including the per-query SQL-conf leak diff -
run via scripts/gate.sh as the round's last act and committed as
GATE_r12.log.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY  # noqa: E402

# Round-12 driver-verification priority: tier 1 = zero driver evidence
# (the new r12 rows); tier 2 = ALL 35 rows whose newest evidence is r8
# (after r12 nothing is older than r9); tier 3 = 12 r9-evidence rows
# riding the r12 snapshots/pyds rewrites.  Exactly 50 slots; the
# remaining r9 rows lead the tail as next round's pool.  Gate
# discipline: this window holds slots only if scripts/driver_sim.py -
# run at sf0.01 by scripts/gate.sh, whose stdout is committed as
# GATE_r12.log BEFORE any prose cites it - exits green (including the
# per-query SQL-conf leak diff) as the round's LAST act.
_PRIORITY = [
    # tier 1: zero driver evidence - the three new r12 rows
    "snapshot_mor_unmatched", "snapshot_dv_heavy_read",
    "snapshot_mirror",
    # tier 2: every row with r8 evidence (alphabetical)
    "bpe_pair_counts", "dup_rate_by_source", "embedding_quality",
    "ewma_user_value", "from_json_typed", "funnel_steps",
    "fuzzy_customer_names", "interp_gapfill", "interval_math",
    "ivfpq_topk", "mad_outliers", "median_stats", "ngram_novelty",
    "pareto_parts", "pivot_priority", "pq_topk",
    "q12_shipmode_priority", "range_join_sessions", "regr_value_trend",
    "resample_gapfill", "rolling_hourly_stats", "rollup_hypertable",
    "sketch_suite", "source_overlap", "string_agg_nations",
    "udtf_tokens", "union_by_name", "unpivot_measures",
    "variant_extract", "weighted_sample", "width_bucket_hist",
    "window_value_suite", "zipf_profile", "zorder_cluster",
    "zscore_anomalies",
    # tier 3: r9-evidence rows riding the r12 rewrites (DV-scan path
    # normalization, change-feed added_dvs planning, merge/lock edits)
    "snapshot_compact", "snapshot_delete_update", "merge_into_apply",
    "merge_newest_wins", "cdc_apply", "lookup_join", "count_star",
    "scan_filter_project", "char_entropy_gate", "decontaminate_bloom",
    "mixture_rebalance", "ngram_containment",
    # tail leaders: the remaining r9-evidence rows (next round's pool)
    "pmi_collocations", "cast_matrix", "complex_types", "cube_agg", "date_parts",
    "date_trunc_extract", "datetime_diff", "distinct_agg",
    "filter_pushdown_ext", "grouping_sets", "json_get",
    "percentile_quantity", "q11_important_parts", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_count", "q17_small_quantity",
    "q18_large_orders", "q1_pricing_summary", "q20_excess_volume",
    "q2_min_cost_supply", "q3_shipping_priority", "q4_order_priority",
    "q5_region_revenue", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "regexp_extract",
    "rollup_orders", "salted_agg", "semi_anti_join", "sessionize_events",
    "set_ops", "stddev_variance", "bpe_merges",
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
