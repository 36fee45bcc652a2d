"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY
from aliyun_maxcompute_data_collectors_spark.session import get_spark

# headline set: the scan/join/agg/window core plus one of each operator family
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "count_star",
    "scan_filter_project",
    "topk_orders",
    "rollup_orders",
    "window_cumulative",
    "merge_newest_wins",
    "lookup_join",
    "cdc_apply",
    "percentile_quantity",
    "date_trunc_extract",
    "sessionize_events",
    "topk_per_group",
    "dedup_exact",
    "minhash_signature",
    "minhash_lsh",
    "text_profile",
    "embedding_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    # warm the JVM + parquet footer caches once with the cheapest query
    REGISTRY["count_star"][0](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count() if df is not None else 0
        times[name] = round(time.perf_counter() - t0, 3)
        _ = n
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
