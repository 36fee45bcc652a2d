"""Data-quality + warehouse-acceleration demo: one-pass profiling,
declarative constraint checks, zonemap file skipping, and partitioned
materialized views with partition-scoped refresh.

Run: python examples/quality_and_views.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.engine import Engine
from aliyun_maxcompute_data_collectors_spark.operators.profile import (
    check_constraints,
    profile,
)
from aliyun_maxcompute_data_collectors_spark.session import get_spark


def main() -> None:
    spark = get_spark("quality-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="wh_demo_")
    eng = Engine(wh, spark)

    eng.sql("CREATE TABLE sales (day STRING, store BIGINT, amt DOUBLE)")
    rows = [(f"d{1 + i % 3}", i % 7, float(i * 10 % 97)) for i in range(1000)]
    spark.createDataFrame(rows, "day string, store long, amt double") \
        .createOrReplaceTempView("src_rows")
    eng.sql("INSERT INTO sales SELECT * FROM src_rows")

    print("-- profile (one scan) --")
    profile(eng.catalog.read_table("sales"), ["store", "amt", "day"]).show(truncate=False)

    print("-- constraint checks --")
    check_constraints(
        eng.catalog.read_table("sales"),
        [
            ("nn_day", "not_null", "day"),
            ("amt_range", "range", "amt", 0.0, 1000.0),
            ("day_regex", "regex", "day", r"^d[0-9]$"),
        ],
    ).show()

    print("-- zonemap file skipping --")
    eng.catalog.insert(
        "sales",
        eng.catalog.read_table("sales").repartitionByRange(4, F.col("store")),
        overwrite=True,
    )
    eng.catalog.build_zonemap("sales", ["store"])
    kept, total = eng.catalog.zonemap_pruned_files("sales", "store", lo=6, hi=6)
    print(f"store=6 scan touches {kept}/{total} files")

    print("-- partitioned materialized view + scoped refresh --")
    eng.sql("CREATE MATERIALIZED VIEW daily PARTITIONED BY (day) AS "
            "SELECT day, CAST(ROUND(SUM(CAST(amt AS DECIMAL(18,6))), 2) AS DOUBLE)"
            " AS total FROM sales GROUP BY day")
    eng.sql("SELECT * FROM daily").orderBy("day").show()
    eng.sql("INSERT INTO sales VALUES ('d2', 99, 500.0)")
    eng.sql("REFRESH MATERIALIZED VIEW daily WHERE day = 'd2'")
    print("after refreshing only d2:")
    eng.sql("SELECT * FROM daily").orderBy("day").show()

    spark.stop()


if __name__ == "__main__":
    main()
