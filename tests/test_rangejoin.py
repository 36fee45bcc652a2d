"""range_join (bin-tagged equijoin) and rollup_cascade correctness."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.rangejoin import range_join, rollup_cascade


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def pts_ivs(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:30:00")),   # inside iv A
            (2, 10, _ts("2024-01-01 02:00:00")),   # exactly at iv A end
            (3, 10, _ts("2024-01-01 05:00:00")),   # no interval
            (4, 20, _ts("2024-01-01 00:30:00")),   # other key, iv B
            (5, 10, _ts("2024-01-03 00:00:00")),   # inside long iv C (many bins)
        ],
        "pid int, k int, t timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),
            ("B", 20, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
            ("C", 10, _ts("2024-01-02 00:00:00"), _ts("2024-01-04 00:00:00")),
        ],
        "iv string, k int, s timestamp, e timestamp",
    )
    return points, intervals


def test_range_join_inner(pts_ivs):
    points, intervals = pts_ivs
    got = sorted(
        (r["pid"], r["iv"])
        for r in range_join(points, intervals, "t", "s", "e", keys=["k"]).collect()
    )
    assert got == [(1, "A"), (2, "A"), (4, "B"), (5, "C")]


def test_range_join_left(pts_ivs):
    points, intervals = pts_ivs
    got = {
        r["pid"]: r["iv"]
        for r in range_join(points, intervals, "t", "s", "e", keys=["k"], how="left").collect()
    }
    assert got == {1: "A", 2: "A", 3: None, 4: "B", 5: "C"}


def test_range_join_no_nested_loop(pts_ivs):
    points, intervals = pts_ivs
    plan = (range_join(points, intervals, "t", "s", "e", keys=["k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_overlapping_intervals(spark):
    """A point inside two overlapping intervals matches both exactly once."""
    points = spark.createDataFrame([(1, _ts("2024-01-01 00:30:00"))], "pid int, t timestamp")
    ivs = spark.createDataFrame(
        [("X", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
         ("Y", _ts("2024-01-01 00:15:00"), _ts("2024-01-01 00:45:00"))],
        "iv string, s timestamp, e timestamp",
    )
    got = sorted(r["iv"] for r in range_join(points, ivs, "t", "s", "e", bin_seconds=600).collect())
    assert got == ["X", "Y"]


def test_rollup_cascade_matches_direct(spark, sf_dir):
    from aliyun_maxcompute_data_collectors_spark.session import load_tables
    ev = (load_tables(spark, sf_dir, ["events"])["events"]
          .select("ts", "event_type", F.col("value").cast("decimal(18,6)").alias("v")))
    out = rollup_cascade(ev, "ts", ["1 hour", "1 day"],
                         group_cols=["event_type"], value_col="v")
    daily = {
        (r["bucket_start"], r["event_type"]): (r["sum_v"], r["n"], r["min_v"], r["max_v"])
        for r in out.where(F.col("resolution") == "1 day").collect()
    }
    direct = {
        (r["b"], r["event_type"]): (r["sum_v"], r["n"], r["min_v"], r["max_v"])
        for r in (
            ev.groupBy(F.date_trunc("day", "ts").alias("b"), "event_type")
            .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n"),
                 F.min("v").alias("min_v"), F.max("v").alias("max_v"))
        ).collect()
    }
    assert daily == direct
