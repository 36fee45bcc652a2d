"""End-to-end pretraining-corpus preparation pipeline over the synthetic
documents table - the order production pipelines use, each stage a
shuffle-bounded operator from this repo:

  1. quality gate      text.filter_pipeline      (one codegen pass)
  2. exact dedup       dedup.incremental_exact_dedup   (vs a history store)
  3. near-dup dedup    dedup.incremental_minhash_dedup (vs band buckets)
  4. span dedup        dedup.span_dedup                (C4 sub-doc rule)
  5. decontamination   dedup.decontaminate             (broadcast benchmark)
  6. boilerplate score corpus.boilerplate_scores       (hot-shingle join)
  7. train/val split   corpus.split_assign             (hash, map-side)
  8. shard export      corpus.write_shards             (one shuffle)

Exact dedup runs BEFORE minhash on purpose: identical-text families make
near-dup pair output quadratic in family size (see SCALE.md, sf10 smoke);
collapsing them first keeps LSH output-sensitive in the intended sense.

Run: python examples/pretrain_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators import corpus, dedup, text
from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    stats = {"input": docs.count()}

    # 1. quality gate - audit once to tune, then filter
    rules = [
        ("len", text.token_count("text").between(10, 100000)),
        ("stopword", text.stopword_ratio("text") >= 0.01),
        ("rep", text.dup_token_ratio("text") <= 0.7),
    ]
    report = text.filter_pipeline(docs, rules)
    drops = {r["drop_reason"]: r["n"] for r in
             report.where(~F.col("kept"))
             .groupBy("drop_reason").agg(F.count(F.lit(1)).alias("n")).collect()}
    # each stage is checkpointed once: the stats counts and the next stage
    # then reuse the materialized survivors instead of re-running the whole
    # upstream chain per action
    quality = text.filter_pipeline(docs, rules, mode="filter") \
        .localCheckpoint(eager=True)
    stats["after_quality"] = quality.count()
    stats.update({f"dropped_{k}": v for k, v in drops.items()})

    # 2-3. dedup: treat even doc_ids as "history already in the corpus"
    history = quality.where(F.col("doc_id") % 2 == 0)
    batch = quality.where(F.col("doc_id") % 2 == 1)
    hist_store = (
        history.select(dedup._fp_or_sentinel("text").alias("fp"),
                       F.col("doc_id").alias("keep_id"))
        .groupBy("fp").agg(F.min("keep_id").alias("keep_id"))
    )
    batch1, fp_delta = dedup.incremental_exact_dedup(
        batch, "doc_id", "text", hist_store)
    batch1 = batch1.localCheckpoint(eager=True)
    stats["after_exact"] = batch1.count()

    # lineage cut: hsig is consumed twice inside incremental_minhash_dedup
    hsig = dedup.minhash_signature(history, "doc_id", "text") \
        .localCheckpoint(eager=True)
    hbuckets = dedup.minhash_band_buckets(hsig)
    batch2, sig_delta, bucket_delta = dedup.incremental_minhash_dedup(
        batch1, "doc_id", "text", sig_store=hsig, bucket_store=hbuckets)
    batch2 = batch2.localCheckpoint(eager=True)
    stats["after_minhash"] = batch2.count()

    # 4. sub-document span dedup (C4 rule): drop repeated aligned 20-word
    # windows corpus-wide, keep the first occurrence, reassemble the text;
    # docs whose every span was seen earlier disappear entirely
    spans = dedup.span_dedup(batch2, "doc_id", "text", span_words=20)
    batch3 = (
        batch2.drop("text")
        .join(spans.select(F.col("id").alias("doc_id"),
                           F.col("text_dedup").alias("text")), "doc_id")
        .localCheckpoint(eager=True)
    )
    stats["after_span"] = batch3.count()

    # 5. decontaminate against a benchmark set (planted: first 5 docs)
    bench = docs.orderBy("doc_id").limit(5).select("text")
    contaminated = dedup.decontaminate(batch3, bench, "doc_id", "text", n=8) \
        .select("doc_id")
    clean = batch3.join(contaminated, "doc_id", "left_anti") \
        .localCheckpoint(eager=True)
    stats["after_decontam"] = clean.count()

    # 6. boilerplate scoring (kept as a column, threshold left to training)
    scored = clean.join(
        corpus.boilerplate_scores(clean, "doc_id", "text",
                                  group_col="source", n=3, min_docs=2)
        .select("doc_id", "boiler_frac"),
        "doc_id")

    # 7-8. deterministic split + sharded export
    final = corpus.split_assign(scored, "doc_id",
                                {"train": 0.9, "val": 0.1}) \
        .localCheckpoint(eager=True)
    train = final.where(F.col("split") == "train")
    corpus.write_shards(train, os.path.join(out_dir, "train"), "doc_id",
                        n_shards=4)
    stats["train"] = train.count()
    stats["val"] = final.where(F.col("split") == "val").count()
    return stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark("pretrain-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        stats = run(spark, sf_dir, out_dir)
        for k, v in stats.items():
            print(f"{k:20s} {v}")
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
