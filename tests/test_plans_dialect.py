"""Plan-introspection checks (pushdown/pruning proof), dialect function
validation, migration DDL + risk report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark import migration as M
from aliyun_maxcompute_data_collectors_spark.functions import dialect as dx
from aliyun_maxcompute_data_collectors_spark.plans import checks as PC
from aliyun_maxcompute_data_collectors_spark.session import load_tables


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders"])
    df = (
        t["orders"]
        .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0))
        .select("o_orderkey", "o_totalprice")
    )
    PC.assert_filter_pushed(df, "o_orderstatus")
    PC.assert_filter_pushed(df, "o_totalprice")
    PC.assert_columns_pruned(df, {"o_orderkey", "o_totalprice", "o_orderstatus"})


def test_partition_pruning_on_catalog_table(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog
    cat = OdpsCatalog(spark, str(tmp_path / "wh"))
    cat.create_table("pt", [("v", "BIGINT")], [("ds", "STRING")])
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "b")], "v long, ds string")
    cat.insert("pt", df)
    q = cat.read_table("pt").where(F.col("ds") == "b")
    assert q.count() == 2
    assert PC.partition_filters(q), "expected PartitionFilters on ds"
    # full-scan guard: no partition predicate -> raises
    with pytest.raises(PC.FullScanDisallowed):
        PC.check_full_scan(cat.read_table("pt").select("v"), ["ds"])
    PC.check_full_scan(q, ["ds"])  # predicate present -> ok
    PC.check_full_scan(cat.read_table("pt"), ["ds"], allow_full_scan=True)


def test_broadcast_join_planned_for_dim(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    j = t["customer"].join(F.broadcast(t["nation"]),
                           F.col("c_nationkey") == F.col("n_nationkey"))
    assert PC.broadcast_join_count(j) == 1
    PC.assert_no_cartesian(j)


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """With a selective filter on the small side of a shuffle join, Spark's
    InjectRuntimeFilter should add a bloom-filter semi-join probe on the big
    side (thresholds lowered for the local data scale; at 100 TB the 10 MB /
    10 GB defaults trigger on real dimension filters)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        t = load_tables(spark, sf_dir, ["lineitem", "orders"])
        sel = t["orders"].where(F.col("o_totalprice") > 400000.0)
        j = t["lineitem"].join(sel, F.col("l_orderkey") == F.col("o_orderkey")) \
            .select("l_orderkey", "l_quantity", "o_totalprice")
        assert PC.runtime_bloom_filter_count(j) >= 1
        # the filter is an optimization, not a semantics change
        expected = t["lineitem"].join(
            t["orders"].where(F.col("o_totalprice") > 400000.0),
            F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert j.count() == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shuffle_count_and_codegen(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem"])
    agg = t["lineitem"].groupBy("l_returnflag").count()
    assert PC.shuffle_count(agg) == 1  # exactly the groupBy exchange
    assert PC.wholestage_codegen_spans(agg) >= 1


def test_decimal_pushdown_guard():
    from pyspark.sql.types import DecimalType, LongType
    assert PC.decimal_pushdown_guard([LongType(), DecimalType(38, 18)])
    assert not PC.decimal_pushdown_guard([DecimalType(38, 26)])  # FIXTURES section 4


def test_dialect_unit_validation():
    with pytest.raises(dx.DialectError):
        dx.datetrunc("fortnight", F.col("x"))
    with pytest.raises(dx.DialectError):
        dx.datepart("era", F.col("x"))
    with pytest.raises(dx.DialectError):
        dx.datetime_diff("nanos", F.col("a"), F.col("b"))
    assert dx.quote_identifier("a`b") == "`a``b`"
    assert dx.qualified("p", "s", "t") == "`p`.`s`.`t`"


def test_dialect_functions_evaluate(spark):
    df = spark.createDataFrame(
        [("2024-03-15 13:45:30", "2024-03-17 01:00:00")], "a string, b string"
    ).select(F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b"))
    row = df.select(
        dx.datetrunc("month", "a").alias("tm"),
        dx.datepart("quarter", "a").alias("q"),
        dx.datetime_diff("day", "a", "b").alias("dd"),
        dx.datetime_diff("hour", "a", "b").alias("dh"),
    ).collect()[0]
    assert str(row["tm"]).startswith("2024-03-01") and row["q"] == 1
    assert row["dd"] == 2 and row["dh"] == 35
    med = spark.range(4).agg(dx.median(F.col("id").cast("double")).alias("m")).collect()
    assert med[0]["m"] == 1.5


def test_migration_ddl_and_risks():
    rep = M.migrate_table_ddl(
        "t", [("a", "int"), ("s", "string"), ("d", "decimal(10,2)"),
              ("m", "map<string,array<int>>"), ("ts", "timestamp")],
        partition_columns=[("ds", "string")],
    )
    assert rep.ok
    assert "CREATE TABLE t" in rep.ddl and "PARTITIONED BY" in rep.ddl
    assert "MAP<STRING,ARRAY<INT>>" in rep.ddl
    risks = {r.hive_type: r.risk for r in rep.risks}
    assert risks["int"] == M.RISK_NONE
    assert risks["string"] == M.RISK_WEAK            # 8MB cell note
    assert risks["timestamp"] == M.RISK_WEAK         # nanos truncation

    bad = M.migrate_table_ddl("u", [("i", "interval day to second")])
    assert not bad.ok


def test_migration_apply(spark, tmp_path):
    from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog
    cat = OdpsCatalog(spark, str(tmp_path / "wh"))
    cols = [("a", "int"), ("s", "string")]
    rep = M.migrate_table_ddl("mig", cols, [("ds", "string")])
    M.apply_migration(cat, rep, cols, [("ds", "string")])
    meta = cat.get_meta("mig")
    assert meta.columns == [("a", "INT"), ("s", "STRING")]
    assert meta.partition_columns == [("ds", "STRING")]


def test_hive_udf_bridge_surface(spark):
    """U2 surface: DDL generation + error contract; live registration is
    env-gated (no UDF jar ships in this container) and skipped."""
    import pytest as _pytest

    from aliyun_maxcompute_data_collectors_spark.functions.hive_udf import (
        drop_hive_udf, hive_function_ddl, register_hive_udf)

    assert hive_function_ddl("my_upper", "com.example.Upper") == \
        "CREATE OR REPLACE TEMPORARY FUNCTION my_upper AS 'com.example.Upper'"
    assert hive_function_ddl("f", "com.x.F", jars=["/tmp/u.jar", "hdfs:///u2.jar"],
                             temporary=False, or_replace=False) == \
        ("CREATE FUNCTION f AS 'com.x.F' "
         "USING JAR '/tmp/u.jar', JAR 'hdfs:///u2.jar'")
    with _pytest.raises(ValueError):
        hive_function_ddl("bad name;drop", "com.x.F")
    with _pytest.raises(ValueError):
        hive_function_ddl("ok", "com.x.F with spaces")

    # registering a class that is not on the classpath must surface Spark's
    # own error, not silently no-op; drop is idempotent either way
    with _pytest.raises(Exception):
        register_hive_udf(spark, "missing_udf", "com.example.DoesNotExist")
        spark.sql("SELECT missing_udf(1)").collect()
    drop_hive_udf(spark, "missing_udf")
