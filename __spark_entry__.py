"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Rotation note (round 5): the driver verifies the first 50 entries of
``queries()`` in iteration order.  After round 4, 143/148 queries are
driver-green at least once; round 5 fronts (a) ``higher_order_fns`` -
the one run-but-never-green row, its array outputs now stringified -
(b) the four late-r4 queries with no driver row yet, (c) every query
whose implementation changed in round 5 (det-kmeans family: narrow
posexplode centroid stats; minhash_lsh: recall-loss warning;
mixture_rebalance: NULL-weight-mass routing), then (d) fills the window
oldest-driver-evidence-first (r2-green queries not re-checked since).
Every query stays registered; only iteration order changes.  All 148
remain covered by the local harness (tests/test_correctness.py), which
since round 5 sorts raw pandas frames exactly like the driver (list
cells throw) and asserts scalar-only output schemas registry-wide;
scripts/driver_sim.py gates rotation slots on a vanilla-session pass.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY  # noqa: E402

# Round-5 driver-verification priority (VERDICT r4 "Next round" item 1):
# tier 1 = the one run-but-red r4 row (array outputs now stringified) plus
# the four late-r4 queries with no driver row; tier 2 = queries whose
# implementation changed in round 5 and must re-verify; tier 3 fills the
# 50-slot window with the queries whose last driver-green evidence is
# OLDEST (r2) so cumulative evidence stays fresh.  Everything else follows
# in registry order.  All tiers passed scripts/driver_sim.py (the
# vanilla-session rows+schema+hash gate) before taking a slot.
_PRIORITY = [
    # tier 1: red-or-unproven after r4 -> cumulative 148/148 when green
    "higher_order_fns", "decontaminate_bloom", "ngram_containment",
    "pmi_collocations", "char_entropy_gate",
    # tier 2: round-5 implementation changes (det-kmeans narrow centroid
    # stats; LSH over-cap warning; mixture NULL-weight routing)
    "semantic_dedup", "ivf_topk", "ivf_assign_incremental",
    "minhash_lsh", "mixture_rebalance",
    # tier 3: oldest driver evidence (green r2, never re-checked since)
    "cast_matrix", "cdc_apply", "complex_types", "count_star", "cube_agg",
    "date_parts", "date_trunc_extract", "datetime_diff", "distinct_agg",
    "filter_pushdown_ext", "grouping_sets", "json_get", "lookup_join",
    "merge_into_apply", "merge_newest_wins", "percentile_quantity",
    "q11_important_parts", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_count", "q17_small_quantity", "q18_large_orders",
    "q1_pricing_summary", "q20_excess_volume", "q2_min_cost_supply",
    "q3_shipping_priority", "q4_order_priority", "q5_region_revenue",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "regexp_extract", "rollup_orders", "salted_agg",
    "scan_filter_project", "semi_anti_join", "sessionize_events",
    "set_ops", "stddev_variance",
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
