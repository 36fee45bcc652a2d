"""Generate larger scale factors from the driver-provided sf0.1 parquet by
key-offset replication, preserving referential integrity.

Usage:  python scripts/scale_up.py [K] [SRC_DIR] [DST_DIR]
        K defaults to 10 (sf0.1 -> sf1), DST to /tmp/spark_graft_scale/sf1.

Why replication and not a generator: the driver's tables (events, documents,
embeddings) are custom, and no offline dbgen exists in this container.
Replication with per-replica key offsets multiplies every fact table and
every distinct join/group key by K while keeping the dims (region/nation)
fixed - exactly the shape a 10x-bigger day of the same workload has.  All
per-key group sizes stay constant, so any superlinear blowup observed at
sfK is an algorithmic red flag, not a data artifact.

Documents: replica r>0 appends a replica tag to the text of 90% of docs
(doc_id % 10 != 0), so ~10% of the corpus becomes genuine cross-replica
exact/near duplicates - dedup queries keep realistic dup rates instead of
every doc having K-1 perfect copies (which would inflate LSH pair output
quadratically in K and measure the wrong thing).

The replication itself is distributed: each table is unioned K times with a
constant offset - no driver-side loops over rows, no collect.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from aliyun_maxcompute_data_collectors_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# per-table key columns that must stay globally unique / referentially
# consistent across replicas -> column: offset-base table
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def _offsets(spark, src: str) -> dict[str, int]:
    """One offset base per key domain: a power of 10 above the max key,
    so replica keys never collide and originals are recognizable."""
    out: dict[str, int] = {}
    for base, table, col in [
        ("customer", "customer", "c_custkey"),
        ("supplier", "supplier", "s_suppkey"),
        ("part", "part", "p_partkey"),
        ("orders", "orders", "o_orderkey"),
        ("events", "events", "event_id"),
        ("users", "events", "user_id"),
        ("documents", "documents", "doc_id"),
        ("embeddings", "embeddings", "vec_id"),
    ]:
        mx = (spark.read.parquet(os.path.join(src, f"{table}.parquet"))
              .agg(F.max(col)).first()[0]) or 0
        off = 10
        while off <= mx:
            off *= 10
        out[base] = off
    return out


# key-derived unique attributes (dbgen generates one distinct value per key):
# must stay unique across replicas, else blocked pair operators (fuzzy match)
# see every value duplicated K times and their inherently output-sensitive
# cost measures K^2 duplicate pairs instead of the workload's real shape
NAME_COLS = {"customer": "c_name", "supplier": "s_name"}


def replicate(df: DataFrame, table: str, k: int,
              offs: dict[str, int]) -> DataFrame:
    parts = []
    for r in range(k):
        rep = df
        for col, base in KEYED.get(table, {}).items():
            rep = rep.withColumn(col, F.col(col) + F.lit(r * offs[base]))
        if r > 0 and table in NAME_COLS:
            nc = NAME_COLS[table]
            rep = rep.withColumn(nc, F.concat(F.col(nc), F.lit(f"#r{r}")))
        if table == "documents" and r > 0:
            rep = rep.withColumn(
                "text",
                F.when(F.col("doc_id") % offs["documents"] % 10 == 0,
                       F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(f" rep{r}"))),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_scale/sf1"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("scale-up")
    spark.sparkContext.setLogLevel("ERROR")
    offs = _offsets(spark, src)
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        big = df if t in ("region", "nation") else replicate(df, t, k, offs)
        # ~k/2 files per table: a directory-style multi-file layout (what a
        # real big table looks like); row-groups still give row-range splits
        out = os.path.join(dst, f"{t}.parquet")
        big.coalesce(max(1, k // 2)).write.mode("overwrite").parquet(out)
        # count the WRITTEN files - counting `big` would re-run the whole
        # k-way replication a second time
        print(t, "rows:", spark.read.parquet(out).count())
    spark.stop()
    print("wrote", dst)


if __name__ == "__main__":
    main()
