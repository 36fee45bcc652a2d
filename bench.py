"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Methodology:
- every query is fully evaluated with a noop-format write: a bare count()
  lets Catalyst prune computed columns, under-measuring projection queries;
- each query runs 1 warmup + $BENCH_ITERS (default 3) timed iterations and
  the MINIMUM warm time is reported: the warmup absorbs whole-stage-codegen
  /JIT compilation (amortized to zero on a long-lived cluster), and min is
  the standard estimator under machine-load noise - it converges to the
  true cost while mean/last are biased upward by interference.  Set
  BENCH_COLD=1 to report the cold first run instead.
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
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_discounted_parts",
    "q2_min_cost_supply",
    "q20_excess_volume",
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
    "asof_join_events",
    "topk_per_group",
    "dedup_exact",
    "minhash_signature",
    "minhash_lsh",
    "text_profile",
    "embedding_topk",
    "pivot_priority",
    "tfidf_keywords",
    "resample_gapfill",
    "profile_documents",
    "constraint_check",
    "scd2_users",
    "temporal_join_pit",
    "ewma_user_value",
    "interp_gapfill",
    "pareto_parts",
    "fuzzy_customer_names",
    "zscore_anomalies",
    "funnel_steps",
    "cohort_retention",
    "heavy_hitter_tokens",
    "recursive_chain",
    "variant_extract",
    "mad_outliers",
    "heavy_hitters_by_lang",
    "boilerplate_frac",
    "shard_assign",
    "dedup_incremental",
    "minhash_incremental",
    "filter_pipeline",
    "span_dedup",
    "q12_shipmode_priority",
    # round-4 additions: late-r3 query missing a prev-round comparison, the
    # two newly exact-oracled ANN queries, and the rebalance/sampling family
    "corpus_drift",
    "ivf_topk",
    "semantic_dedup",
    "mixture_rebalance",
    "weighted_sample",
    "split_leakage",
    "ccnet_buckets",
    "source_overlap",
    "zipf_profile",
    "ngram_novelty",
    "ivf_assign_incremental",
    "embedding_quality",
    "dup_rate_by_source",
    "decontaminate_bloom",
    "ngram_containment",
    "pmi_collocations",
    "char_entropy_gate",
    # round-6 additions: the product-quantization ANN path
    "pq_topk",
    "pq_code_hist",
    "ivfpq_topk",
    # round-7 additions: the snapshot/transaction layer (each run builds
    # a throwaway versioned table from fixture slices - commit + time
    # travel / CDF / compaction cost is what's being measured)
    "snapshot_time_travel",
    "snapshot_changes",
    "snapshot_compact",
    "snapshot_pruned_read",
    "snapshot_merge",
    # round-7 late additions: stride-1 substring dedup, BM25 retrieval,
    # BPE merge learning, and the Python Data Source front-ends (each
    # pyds run measures the full DSv2 write-commit + read cycle)
    "substring_dedup",
    "bm25_topk",
    "bpe_merges",
    "pyds_snapshot_read",
    "pyds_avro_read",
    "mv_refresh",
    "snapshot_schema_evolution",
    "snapshot_zorder_prune",
    "snapshot_bloom_prune",
    # round-8 additions: BPE's oracled pair-count foundation; OPTIMIZE
    # with bloom rebuild (two bloomed appends + compact + re-bloomed
    # point-lookup prune - a maintenance-job cost, measured as one)
    "bpe_pair_counts",
    "snapshot_bloom_compact",
    # round-11 additions: row-level CDF on a COW commit (update 1 row in
    # a multi-row file; the delta-planned changes() diffs only the
    # swapped file pair - measures the O(touched) change-feed cost) and
    # merge-on-read delete (deletion-vector write + anti-join read)
    "snapshot_row_cdf",
    "snapshot_mor_delete",
    # round-12 additions: WHEN NOT MATCHED BY SOURCE resolved to DV
    # positions (the CDC full-sync shape) and the DV-heavy read - 16
    # accumulated MOR deletes (~1e5 positions at sf0.1), the anti-join
    # read tax, and the compact() payoff, measured not assumed
    "snapshot_mor_unmatched",
    "snapshot_dv_heavy_read",
]


def _iters() -> int:
    """Timed warm iterations per query (>=3 for a noise-robust minimum)."""
    return max(1, int(os.environ.get("BENCH_ITERS", "3")))


def _evaluate(df) -> None:
    """Force full evaluation of every output column without collecting."""
    df.write.format("noop").mode("overwrite").save()


def _bench_writes(spark, sf_dir: str, cold: bool) -> dict[str, float]:
    """Write-path benchmarks - the operator family the reference actually is
    (W1/W5 plain append, O1-O5 hash-bucketed clustered write)."""
    import shutil
    import tempfile

    from aliyun_maxcompute_data_collectors_spark.catalog import BucketSpec, OdpsCatalog
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    from aliyun_maxcompute_data_collectors_spark.types import to_odps_type

    from pyspark.sql import functions as F

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    # string-keyed variant: lineitem has no high-cardinality string, so
    # derive the order-line business key a real schema would carry; the row
    # exists to measure the string ODPS-hash path (expression vs arrow UDF).
    # The key is MATERIALIZED to parquet before timing (round 6): a real
    # string-keyed table stores its key, so re-deriving the concat inside
    # every timed insert (~0.22s/600k rows at sf0.1) would charge key
    # derivation to the write path and overstate the string-hash penalty.
    str_src = tempfile.mkdtemp(prefix="benchsrc_")
    (li.withColumn(
        "l_linekey",
        F.concat(F.lit("ORD-"), F.col("l_orderkey"), F.lit("-"),
                 F.col("l_linenumber")))
     .write.mode("overwrite").parquet(str_src))
    li_str = spark.read.parquet(str_src)
    cols = [(f.name, to_odps_type(f.dataType)) for f in li.schema.fields]
    cols_str = [(f.name, to_odps_type(f.dataType)) for f in li_str.schema.fields]
    wh = tempfile.mkdtemp(prefix="benchwh_")
    out: dict[str, float] = {}
    try:
        cat = OdpsCatalog(spark, wh)
        cat.create_table("w_plain", cols)
        cat.create_table("w_bucketed", cols,
                         bucket=BucketSpec("hash", 16, ["l_orderkey"],
                                           [("l_orderkey", "ASC")]))
        cat.create_table("w_bucketed_str", cols_str,
                         bucket=BucketSpec("hash", 16, ["l_linekey"],
                                           [("l_linekey", "ASC")]))
        # decomposition control (round 6): SAME 17-column string-carrying
        # dataset, bucketed by the LONG key.  write_bucketed_str vs
        # write_bucketed conflates two costs - scanning+writing one extra
        # string column (~1.13x, paid by ANY string-keyed schema) and the
        # arrow-UDF string hash + string sort (the actual string-path
        # cost).  write_bucketed_strcols isolates them:
        #   strcols/bucketed      = column-count cost
        #   bucketed_str/strcols  = string-KEY cost (the 1.5x-bar quantity)
        cat.create_table("w_bucketed_strcols", cols_str,
                         bucket=BucketSpec("hash", 16, ["l_orderkey"],
                                           [("l_orderkey", "ASC")]))
        # writes get two extra warm iterations: the write_bucketed_str /
        # write_bucketed ratio is judged against a 1.5x bar and single-run
        # jitter on ~1s writes is +-0.1s, enough to flip the verdict; a
        # min over 5 warm runs is stable where 3 was not (round 6)
        iters = 1 if cold else _iters() + 2
        for name, table, src in [("write_append", "w_plain", li),
                                 ("write_bucketed", "w_bucketed", li),
                                 ("write_bucketed_strcols",
                                  "w_bucketed_strcols", li_str),
                                 ("write_bucketed_str", "w_bucketed_str", li_str)]:
            runs = []
            for _ in range(1 if cold else 1 + iters):
                t0 = time.perf_counter()
                cat.insert(table, src, overwrite=True)
                runs.append(time.perf_counter() - t0)
            out[name] = round(min(runs) if cold else min(runs[1:]), 3)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(str_src, ignore_errors=True)
    return out


def _load1() -> float:
    """1-minute load average - recorded in the output so a drifted bench
    number can be attributed to machine load instead of a plan regression
    (VERDICT r5 ask #3: two rounds of unconfirmed 'probably load' theory)."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - getloadavg unavailable
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    cold = os.environ.get("BENCH_COLD") == "1"
    load_before = _load1()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    iters = 1 if cold else _iters()
    times: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name][0]
        runs = []
        for _ in range(1 if cold else 1 + iters):
            t0 = time.perf_counter()
            _evaluate(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs) if cold else min(runs[1:]), 3)
    times.update(_bench_writes(spark, sf_dir, cold))
    total = round(sum(times.values()), 3)
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "load1_before": load_before,
        "load1_after": _load1(),
    })
    # Tail-robust result publication (r13, VERDICT r12 ask #2a): the driver
    # captures a bounded stdout tail and 8 consecutive rounds of its bench
    # artifacts (r4-r11) were cut MID-JSON, nuking round-over-round PERF.
    # So (1) the result is ALSO durably written to BENCH_SELF.json next to
    # this script before anything else can go wrong, and (2) the stdout
    # JSON is printed as the absolute last act - after spark.stop(), whose
    # shutdown races could interleave output - followed by an explicit
    # flush.  Methodology and line format are byte-identical to r12.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_SELF.json"), "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout remains the contract
    spark.stop()
    sys.stdout.flush()
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
