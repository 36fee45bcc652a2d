"""Streaming + CDC demo: file stream -> time-partitioned sink, then an
I/U/D ops stream merged into a snapshot table, checkpointed end to end.

Run: python examples/streaming_cdc.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog
from aliyun_maxcompute_data_collectors_spark.session import get_spark
from aliyun_maxcompute_data_collectors_spark.streaming.sink import (
    cdc_stream_writer, partitioned_stream_writer, run_to_completion)


def main() -> None:
    spark = get_spark("streaming-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    cat = OdpsCatalog(spark, os.path.join(root, "wh"))

    # 1. event stream -> dt=yyyy-MM-dd--HH partitioned table
    with open(os.path.join(src, "batch1.json"), "w") as f:
        for i in range(100):
            f.write(json.dumps({
                "id": i, "et": "click" if i % 2 else "view",
                "ts": f"2024-03-01 {i % 24:02d}:00:00",
            }) + "\n")
    cat.create_table("clicks", [("id", "BIGINT"), ("et", "STRING")], [("dt", "STRING")])
    stream = (spark.readStream.schema("id long, et string, ts string").json(src)
              .withColumn("ts", F.col("ts").cast("timestamp_ntz")))
    run_to_completion(partitioned_stream_writer(
        stream, cat, "clicks", os.path.join(root, "ck1"), time_col="ts"))
    cat.read_table("clicks").groupBy("dt").count().orderBy("dt").show(5)

    # 2. CDC ops stream -> snapshot table
    cat.create_table("accounts", [("k", "BIGINT"), ("balance", "DOUBLE")])
    cat.insert("accounts", spark.createDataFrame(
        [(1, 100.0), (2, 50.0)], "k long, balance double"))
    ops_src = os.path.join(root, "ops")
    os.makedirs(ops_src)
    with open(os.path.join(ops_src, "ops1.json"), "w") as f:
        for op in [{"k": 2, "op": "U", "seq": 1, "balance": 75.0},
                   {"k": 1, "op": "D", "seq": 2, "balance": None},
                   {"k": 3, "op": "I", "seq": 3, "balance": 10.0}]:
            f.write(json.dumps(op) + "\n")
    ops_stream = spark.readStream.schema("k long, op string, seq long, balance double").json(ops_src)
    run_to_completion(cdc_stream_writer(
        ops_stream, cat, "accounts", os.path.join(root, "ck2"),
        key_cols=["k"], order_cols=["seq"]))
    print("snapshot after CDC apply (1 deleted, 2 updated, 3 inserted):")
    cat.read_table("accounts").orderBy("k").show()


if __name__ == "__main__":
    main()
