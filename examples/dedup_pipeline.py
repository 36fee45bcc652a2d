"""Training-data dedup pipeline demo over the synthetic documents table:
profile -> exact dedup -> minhash near-dup -> similarity search.

Run: python examples/dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
    dedupe_corpus, minhash_lsh_pairs)
from aliyun_maxcompute_data_collectors_spark.operators.similarity import cosine_topk
from aliyun_maxcompute_data_collectors_spark.operators.text import document_profile
from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dedup-demo")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["documents", "embeddings"])

    docs = t["documents"]
    prof = document_profile(docs)
    print("document profile sample:")
    prof.select("doc_id", "n_tokens", "quality", "pred_lang", "fp").show(5, truncate=False)

    good = prof.where(F.col("quality") >= 0.6).drop(
        "n_tokens", "n_bpe_tokens", "punct_ratio", "stopword_ratio",
        "mean_word_len", "quality", "pred_lang", "fp")
    print(f"quality filter: {docs.count()} -> {good.count()} docs")

    pairs = minhash_lsh_pairs(good, "doc_id", "text", threshold=0.8)
    print("near-dup pairs (minhash banding):", pairs.count())
    pairs.show(5)

    deduped = dedupe_corpus(good, "doc_id", "text", method="minhash", threshold=0.8)
    print(f"after near-dup removal: {deduped.count()} docs")

    emb = t["embeddings"]
    print("cosine top-3 neighbors for 3 query vectors:")
    cosine_topk(emb.where(F.col("vec_id") < 3), emb, k=3).show()


if __name__ == "__main__":
    main()
