"""Temporal warehouse demo: a CDC changelog becomes SCD2 history, maintained
incrementally by a stream, then consumed three ways — point-in-time join,
snapshot-at-T, and EWMA smoothing over the fact stream.

Run: python examples/temporal_scd2.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog
from aliyun_maxcompute_data_collectors_spark.operators.scd import (
    scd2_build, snapshot_at, temporal_join)
from aliyun_maxcompute_data_collectors_spark.operators.timeseries import ewma
from aliyun_maxcompute_data_collectors_spark.session import get_spark
from aliyun_maxcompute_data_collectors_spark.streaming.sink import (
    run_to_completion, scd2_stream_writer)


def main() -> None:
    spark = get_spark("temporal-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scd2_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    cat = OdpsCatalog(spark, os.path.join(root, "wh"))

    # 1. a price changelog arrives as two stream micro-batches; the second
    #    batch includes a LATE row that splices into already-built history
    batches = [
        [{"sku": 1, "ts": "2024-01-01 00:00:00", "price": 9.99},
         {"sku": 1, "ts": "2024-01-20 00:00:00", "price": 12.99},
         {"sku": 2, "ts": "2024-01-05 00:00:00", "price": 5.00}],
        [{"sku": 1, "ts": "2024-01-10 00:00:00", "price": 10.99},  # late!
         {"sku": 2, "ts": "2024-01-25 00:00:00", "price": 4.50}],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    cat.create_table("price_dim", [
        ("sku", "BIGINT"), ("price", "DOUBLE"), ("version", "INT"),
        ("effective_from", "TIMESTAMP"), ("effective_to", "TIMESTAMP"),
        ("is_current", "BOOLEAN"),
    ])
    stream = (
        spark.readStream.schema("sku long, ts string, price double")
        .option("maxFilesPerTrigger", "1").json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    run_to_completion(scd2_stream_writer(
        stream, cat, "price_dim", os.path.join(root, "ck"),
        keys=["sku"], time_col="ts"))
    print("== SCD2 history (late row spliced as version 2) ==")
    cat.read_table("price_dim").orderBy("sku", "version").show()

    # 2. point-in-time join: each order priced at ITS OWN date
    orders = spark.createDataFrame(
        [(100, 1, "2024-01-03"), (101, 1, "2024-01-15"), (102, 1, "2024-01-28"),
         (103, 2, "2024-01-06")],
        "order_id long, sku long, odate string",
    ).withColumn("odate", F.to_timestamp("odate"))
    pit = temporal_join(orders, cat.read_table("price_dim"), "sku", "odate")
    print("== orders priced as-of their date ==")
    pit.select("order_id", "sku", "odate", "dim_price", "dim_version") \
        .orderBy("order_id").show()

    # 3. snapshot of the catalog as of Jan 12 (time travel)
    log = cat.read_table("price_dim").select(
        "sku", F.col("effective_from").alias("ts"), "price")
    print("== snapshot at 2024-01-12 ==")
    snapshot_at(log, "sku", "ts", "2024-01-12 00:00:00") \
        .orderBy("sku").show()

    # 4. EWMA over a noisy fact stream per sku
    facts = spark.createDataFrame(
        [(1, i, 100.0 + (i % 5) * 7.0) for i in range(12)],
        "sku long, seq long, qty double")
    print("== EWMA(alpha=0.4) over qty ==")
    ewma(facts, "sku", "seq", "qty", alpha=0.4) \
        .select("seq", "qty", F.round("ewma_value", 3).alias("ewma")) \
        .orderBy("seq").show()

    spark.stop()


if __name__ == "__main__":
    main()
