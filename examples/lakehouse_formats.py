"""Lakehouse formats on a PLAIN SparkSession: the Python Data Sources
(sources/pyds.py) give any tool that can call ``spark.read.format(...)``
full access to snapshot tables (time travel, pruned reads, transactional
writes, streaming) and Avro container files - no package imports needed
after the one registration call.

Run: python examples/lakehouse_formats.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables
from aliyun_maxcompute_data_collectors_spark.snapshots import SnapshotTable
from aliyun_maxcompute_data_collectors_spark.sources.pyds import (
    register_python_datasources,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse-formats")
    spark.sparkContext.setLogLevel("ERROR")
    register_python_datasources(spark)  # the only engine-specific call

    orders = load_tables(spark, sf_dir, ["orders"])["orders"].select(
        "o_orderkey", "o_totalprice")
    m = F.col("o_orderkey") % 10
    work = tempfile.mkdtemp(prefix="lakehouse_demo_")
    tbl = os.path.join(work, "orders_snap")
    try:
        # -- transactional writes through the DSv2 commit protocol ------
        SnapshotTable.init(spark, tbl)
        orders.where(m < 5).write.format("graft_snapshot") \
            .option("path", tbl).mode("append").save()
        orders.where((m >= 5) & (m < 8)).write.format("graft_snapshot") \
            .option("path", tbl).mode("append").save()
        head = spark.read.format("graft_snapshot").option("path", tbl).load()
        print(f"HEAD rows: {head.count()}")

        # -- time travel ------------------------------------------------
        v2 = (spark.read.format("graft_snapshot").option("path", tbl)
              .option("version", "2").load())
        print(f"v2 rows:   {v2.count()} (first append only)")

        # -- pruned read: the filter reaches the manifest planner -------
        mx = orders.agg(F.max("o_orderkey")).collect()[0][0]
        small = head.where(F.col("o_orderkey") <= mx // 10)
        print(f"filtered:  {small.count()} rows "
              "(files pruned from manifest [min,max] stats)")

        # -- streaming: consume appends incrementally -------------------
        out = os.path.join(work, "stream_out")
        q = (spark.readStream.format("graft_snapshot")
             .option("path", tbl).option("starting_version", "1").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", os.path.join(work, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        print(f"streamed:  {spark.read.parquet(out).count()} rows replayed")

        # -- avro round trip through the same format surface ------------
        adir = os.path.join(work, "avro")
        orders.limit(500).coalesce(1).write.format("graft_avro") \
            .option("path", adir).option("block_records", "100") \
            .mode("append").save()
        f = glob.glob(os.path.join(adir, "*.avro"))[0]
        av = (spark.read.format("graft_avro").option("path", f)
              .option("split_bytes", str(max(1, os.path.getsize(f) // 4)))
              .load())
        print(f"avro:      {av.count()} rows back across >=4 byte-range "
              "tasks of one container file")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
