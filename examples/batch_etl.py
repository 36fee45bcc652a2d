"""End-to-end batch ETL demo: warehouse catalog, partitioned + bucketed
tables, static/dynamic inserts, point lookup, SQL over the catalog.

Run: python examples/batch_etl.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.catalog import BucketSpec
from aliyun_maxcompute_data_collectors_spark.engine import Engine


def main() -> None:
    eng = Engine(tempfile.mkdtemp(prefix="wh_"))
    eng.spark.sparkContext.setLogLevel("ERROR")
    spark = eng.spark

    # partitioned fact table + hash-clustered dim
    eng.catalog.create_table(
        "events", [("event_id", "BIGINT"), ("user_id", "BIGINT"), ("value", "DOUBLE")],
        partition_columns=[("dt", "STRING")],
    )
    eng.catalog.create_table(
        "users", [("user_id", "BIGINT"), ("name", "STRING")],
        bucket=BucketSpec("hash", 8, ["user_id"]),
    )

    events = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 50).alias("user_id"),
        F.rand(42).alias("value"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string")).alias("dt"),
    )
    eng.catalog.insert("events", events)
    users = spark.range(50).select(
        F.col("id").alias("user_id"), F.concat(F.lit("user"), F.col("id")).alias("name"))
    eng.catalog.insert("users", users)

    print("partitions:", eng.catalog.list_partitions("events"))
    print("max_pt:", eng.catalog.max_pt("events"))

    # SQL over the catalog; partition predicate prunes directories
    df = eng.sql("""
        SELECT dt, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM events WHERE dt >= '2024-01-02' GROUP BY dt ORDER BY dt
    """)
    df.show()
    print("plan audit:", eng.plan_report(df))

    # hash-clustered point lookup: scans 1 of 8 bucket dirs
    eng.catalog.lookup_by_key("users", {"user_id": 7}).show()

    # dynamic-partition overwrite replaces only touched partitions
    patch = spark.createDataFrame([(9999, 1, 0.5, "2024-01-02")],
                                  "event_id long, user_id long, value double, dt string")
    eng.catalog.insert("events", patch, overwrite=True)
    eng.sql("SELECT dt, COUNT(*) AS n FROM events GROUP BY dt ORDER BY dt").show()


if __name__ == "__main__":
    main()
