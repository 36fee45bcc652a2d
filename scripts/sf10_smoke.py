"""sf10 spot smoke: time selected queries at sf1 and sf10 (10x) and merge
results into SCALE_SMOKE10.json.

    python scripts/scale_up.py 10  /root/testdata/sf0.1 /tmp/spark_graft_scale/sf1
    python scripts/scale_up.py 100 /root/testdata/sf0.1 /tmp/spark_graft_scale/sf10
    python scripts/sf10_smoke.py [query ...]        # default: the spot set

Flag rule matches sf1_smoke.py: SUPERLINEAR when t(sf10) > 10*t(sf1) + 2s.
Existing entries for queries not re-run are preserved (the file accumulates
coverage across rounds).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY
from aliyun_maxcompute_data_collectors_spark.session import get_spark

from bench import _evaluate  # noqa: E402

# round-4 spot set: the r3 entries plus the heavier round-3 LLM-pipeline
# operators the judge asked to cover (VERDICT r3 ask #7)
SPOT = [
    "q1_pricing_summary", "q5_region_revenue", "q18_large_orders",
    "count_star", "scan_filter_project", "rollup_orders",
    "window_cumulative", "sessionize_events", "dedup_exact",
    "minhash_signature", "minhash_lsh", "text_profile", "tfidf_keywords",
    "interp_gapfill", "resample_gapfill", "heavy_hitter_tokens",
    "funnel_steps", "embedding_topk", "span_dedup", "mixture_rebalance",
    "weighted_sample", "split_leakage",
    # round-4 additions
    "boilerplate_frac", "minhash_incremental", "dedup_incremental",
    "filter_pipeline", "shard_assign", "corpus_drift", "ngram_jaccard",
    "pack_sequences", "doc_logprob", "ivf_topk", "semantic_dedup",
    # round-6 additions: the PQ compressed-scan ANN family + the recall
    # audit composition
    "pq_topk", "pq_code_hist", "ivfpq_topk", "ann_recall",
    # round-6 breadth extension: window/join/UDTF/semi-structured families
    "cohort_retention", "temporal_join_pit", "window_rank_suite",
    "udtf_tokens", "pivot_priority", "variant_extract",
    "q3_shipping_priority", "topk_per_group", "asof_join_events",
    "zscore_anomalies", "scd2_users", "pareto_parts",
    # round-7 additions (VERDICT r6 ask #7): the snapshot/transaction
    # layer and an Avro write->split-read cycle get the same superlinear
    # screening as the query families
    "snapshot_time_travel", "snapshot_changes", "snapshot_compact",
    "avro_cycle",
    # round-7 late additions: stride-1 substring dedup and the Python
    # Data Source front-ends (DSv2 write commit + pushdown-pruned read;
    # avro sync-split read through format("graft_avro"))
    "substring_dedup", "pyds_snapshot_read", "pyds_avro_read",
    "bm25_topk", "bpe_merges", "pyds_stream_cycle", "mv_refresh",
    "snapshot_schema_evolution", "snapshot_zorder_prune",
    "snapshot_bloom_prune",
    # round-8 additions: BPE's oracled pair-count foundation, OPTIMIZE
    # bloom rebuild, SQL-identifier snapshot access (Engine.sql rewrite
    # cost is metadata; the table build dominates)
    "bpe_pair_counts", "snapshot_bloom_compact", "engine_sql_snapshot",
    # round-9 additions: file-list segmentation lifecycle, bare-session
    # SQL temp-view reads, and copy-on-write row-level DML
    "snapshot_filelist_segments", "pyds_sql_view", "snapshot_delete_update",
    "snapshot_replace_where", "cdc_cow_merge",
    # round-11 additions: row-level CDF on COW commits (delta-planned
    # changes(), O(touched files)) and the table_changes SQL TVF with
    # per-commit attribution
    "snapshot_row_cdf", "engine_table_changes", "snapshot_mor_delete",
    # round-12 additions: NOT MATCHED BY SOURCE under MOR, the DV-heavy
    # read cycle (accumulate positions -> anti-join read -> compact),
    # and the mirror() full sync - all linear in table + positions
    "snapshot_mor_unmatched", "snapshot_dv_heavy_read", "snapshot_mirror",
]


def _avro_cycle(spark, sf_dir: str):
    """write_avro of a bounded orders slice (3% of keys - linear in the
    corpus via the scan, bounded per-row Python encode) then read it back
    through sync-marker splitting; returns the verified row count."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    from aliyun_maxcompute_data_collectors_spark.sources.avrofile import (
        read_avro, write_avro)

    o = (load_tables(spark, sf_dir, ["orders"])["orders"]
         .where(F.col("o_orderkey") % 100 < 3)
         .select("o_orderkey", "o_custkey", "o_totalprice"))
    d = tempfile.mkdtemp(prefix="avro_smoke_")
    try:
        write_avro(o, d)
        n = read_avro(spark, d, split_bytes=8 << 20).count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.range(1).select(F.lit(n).alias("n_rows"))


# non-registry smoke subjects (source/sink layers exercised end-to-end)
EXTRAS = {"avro_cycle": _avro_cycle}

SMOKE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCALE_SMOKE10.json")


def _time(spark, fn, sf_dir: str) -> float:
    runs = []
    for _ in range(2):  # 1 warmup + 1 timed
        t0 = time.perf_counter()
        _evaluate(fn(spark, sf_dir))
        runs.append(time.perf_counter() - t0)
    return round(runs[-1], 3)


def main() -> None:
    names = sys.argv[1:] or SPOT
    sf1 = "/tmp/spark_graft_scale/sf1"
    sf10 = "/tmp/spark_graft_scale/sf10"
    out: dict[str, dict] = {}
    if os.path.exists(SMOKE_PATH):
        out = json.load(open(SMOKE_PATH))
    spark = get_spark("sf10-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name in REGISTRY:
            fn = REGISTRY[name][0]
        elif name in EXTRAS:
            fn = EXTRAS[name]
        else:
            continue
        t1 = _time(spark, fn, sf1)
        t10 = _time(spark, fn, sf10)
        ratio = round(t10 / t1, 2) if t1 else None
        flag = "SUPERLINEAR" if t10 > 10 * t1 + 2.0 else "ok"
        entry = {"sf1": t1, "sf10": t10, "ratio": ratio, "flag": flag}
        # carry forward every recorded proof note (r4_proof, r5_proof, ...)
        for key, val in (out.get(name) or {}).items():
            if key.endswith("_proof"):
                entry[key] = val
        out[name] = entry
        rtxt = f"{ratio:<7}" if ratio is not None else "n/a    "
        print(f"{name:28s} sf1={t1:8.3f} sf10={t10:8.3f} x{rtxt} {flag}",
              flush=True)
        # dump after every query: an OOM on query N must not lose 1..N-1
        json.dump(out, open(SMOKE_PATH, "w"), indent=1)
    spark.stop()
    bad = [k for k, v in out.items() if v["flag"] != "ok"]
    print(json.dumps({"superlinear": bad, "n": len(out)}))


if __name__ == "__main__":
    main()
