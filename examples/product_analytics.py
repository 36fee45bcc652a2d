"""Product-analytics demo over the synthetic event stream: conversion
funnel, cohort retention, robust outliers, and exact heavy hitters.

Run: python examples/product_analytics.py  (uses /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.corpus import heavy_hitters
from aliyun_maxcompute_data_collectors_spark.operators.relational import (
    cohort_retention, funnel, zscore_outliers)
from aliyun_maxcompute_data_collectors_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("product-analytics", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_tables(spark, SF_DIR, ["events"])["events"]

    print("== signup -> view -> purchase funnel (per-step conversion) ==")
    f = funnel(ev, "user_id", "ts",
               steps=[F.col("event_type") == "signup",
                      F.col("event_type") == "view",
                      F.col("event_type") == "purchase"])
    f.agg(F.count("step_1").alias("reached_signup"),
          F.count("step_2").alias("then_viewed"),
          F.count("step_3").alias("then_purchased")).show()

    print("== purchase cohort retention (first 5 offsets) ==")
    purchases = ev.where(F.col("event_type") == "purchase")
    cohort_retention(purchases, "user_id", "ts") \
        .where(F.col("day_offset") <= 4) \
        .orderBy("cohort_day", "day_offset").show(10)

    print("== value outliers (>3 sigma within event type) ==")
    zscore_outliers(ev, ["event_type"], "value", threshold=3.0) \
        .groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.max("zscore"), 2).alias("max_z")).show()

    print("== heavy-hitter tokens (>3% of corpus, exact counts) ==")
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    heavy_hitters(toks, "tok", phi=0.03).orderBy(F.desc("cnt")).show(8)

    spark.stop()


if __name__ == "__main__":
    main()
