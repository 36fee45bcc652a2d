"""LIVE Hive UDF/UDTF registration (SURVEY U2) - the half of the bridge
that was env-gated until round 6.

hive-exec-2.3.10-core.jar ships on Spark's own classpath with real
GenericUDF/UDTF implementations, and spark-hive provides the
HiveSessionCatalog that routes `CREATE TEMPORARY FUNCTION ... AS class` to
Spark's HiveSimpleUDF/HiveGenericUDF wrappers (the upstream of the
reference's forked hiveUDFs.scala).  The in-memory catalog the shared test
session uses rejects Hive classes (NO_HANDLER_FOR_UDAF), so this test runs
in a SUBPROCESS with catalogImplementation=hive - one extra JVM (~40s),
real evaluation end to end."""

from __future__ import annotations

import os
import subprocess
import sys

PROBE = r'''
import os, sys, tempfile
os.chdir(tempfile.mkdtemp(prefix="hivewh_"))  # derby metastore off-repo
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("hiveudf-live")
         .config("spark.sql.catalogImplementation", "hive")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from aliyun_maxcompute_data_collectors_spark.functions.hive_udf import (
    drop_hive_udf, register_hive_udf)

# GenericUDF: soundex ('Robert' and 'Rupert' share code R163)
register_hive_udf(spark, "h_soundex",
                  "org.apache.hadoop.hive.ql.udf.generic.GenericUDFSoundex")
r = spark.sql("SELECT h_soundex('Robert') a, h_soundex('Rupert') b").head()
assert (r["a"], r["b"]) == ("R163", "R163"), r

# simple UDF (HiveSimpleUDF wrapper): base conversion
register_hive_udf(spark, "h_conv", "org.apache.hadoop.hive.ql.udf.UDFConv")
assert spark.sql("SELECT h_conv('ff', 16, 10) v").head()["v"] == "255"

# GenericUDTF: stack() produces rows
register_hive_udf(spark, "h_stack",
                  "org.apache.hadoop.hive.ql.udf.generic.GenericUDTFStack")
rows = spark.sql("SELECT h_stack(2, 'a', 1, 'b', 2)").collect()
assert len(rows) == 2 and rows[0][0] == "a", rows

# the UDF composes with real tables like any built-in: the synthetic
# names NATION_0..24 differ only in digits, which soundex ignores, so
# every row collapses to the single code N350
spark.read.parquet("/root/testdata/sf0.001/nation.parquet") \
    .createOrReplaceTempView("nation")
r = spark.sql("SELECT count(DISTINCT h_soundex(n_name)) c, "
              "min(h_soundex(n_name)) m FROM nation").head()
assert (r["c"], r["m"]) == (1, "N350"), r

drop_hive_udf(spark, "h_soundex")
try:
    spark.sql("SELECT h_soundex('x')").collect()
    raise AssertionError("dropped UDF still resolvable")
except Exception:
    pass
print("HIVE-UDF-LIVE-OK")
'''


def test_live_hive_udf_registration():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", PROBE.format(repo=repo)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable})
    assert "HIVE-UDF-LIVE-OK" in out.stdout, (
        out.stdout[-2000:], out.stderr[-2000:])
