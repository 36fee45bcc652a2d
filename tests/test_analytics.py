"""Unit tests for the advanced-analytics operators (SCD2/temporal, EWMA,
interpolation, Pareto frontier, fuzzy matching, z-score outliers) — edge
cases the DuckDB-oracle queries don't exercise."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.operators.dedup import (
    fuzzy_pairs_levenshtein,
)
from aliyun_maxcompute_data_collectors_spark.operators.relational import (
    pareto_frontier_2d,
    zscore_outliers,
)
from aliyun_maxcompute_data_collectors_spark.operators.scd import (
    scd2_build,
    snapshot_at,
    temporal_join,
)
from aliyun_maxcompute_data_collectors_spark.operators.timeseries import (
    ewma,
    interpolate_linear,
)


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def changelog(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "a"),
            (1, _ts("2024-01-03T00:00:00"), "b"),
            (1, _ts("2024-01-05T00:00:00"), "b"),  # unchanged image
            (1, _ts("2024-01-07T00:00:00"), "c"),
            (2, _ts("2024-01-02T00:00:00"), "x"),
        ],
        "k bigint, ts timestamp, attr string",
    )


class TestSCD2:
    def test_versions_and_intervals(self, changelog):
        rows = {
            (r.k, r.version): r
            for r in scd2_build(changelog, "k", "ts").collect()
        }
        assert len(rows) == 5
        v1 = rows[(1, 1)]
        assert v1.attr == "a" and v1.effective_to == _ts("2024-01-03T00:00:00")
        v4 = rows[(1, 4)]
        assert v4.is_current and v4.effective_to is None
        assert rows[(2, 1)].is_current

    def test_collapse_unchanged(self, changelog):
        rows = sorted(
            scd2_build(changelog, "k", "ts", collapse_unchanged=True).collect(),
            key=lambda r: (r.k, r.version),
        )
        k1 = [r for r in rows if r.k == 1]
        assert [r.attr for r in k1] == ["a", "b", "c"]
        # the collapsed 'b' version spans both identical images
        assert k1[1].effective_from == _ts("2024-01-03T00:00:00")
        assert k1[1].effective_to == _ts("2024-01-07T00:00:00")

    def test_snapshot_boundary_inclusive(self, changelog):
        snap = snapshot_at(changelog, "k", "ts", "2024-01-03 00:00:00")
        got = {r.k: r.attr for r in snap.collect()}
        assert got == {1: "b", 2: "x"}  # ts == T included

    def test_temporal_join_before_first_version(self, spark, changelog):
        dim = scd2_build(changelog, "k", "ts")
        probe = spark.createDataFrame(
            [
                (10, 1, _ts("2023-12-25T00:00:00")),  # before history
                (11, 1, _ts("2024-01-03T00:00:00")),  # on a boundary
                (12, 1, _ts("2024-01-08T00:00:00")),  # open interval
                (13, 3, _ts("2024-01-04T00:00:00")),  # unknown key
            ],
            "pid bigint, k bigint, pts timestamp",
        )
        out = {
            r.pid: r.dim_attr
            for r in temporal_join(probe, dim, "k", "pts").collect()
        }
        assert out == {10: None, 11: "b", 12: "c", 13: None}


class TestParetoFrontier:
    def test_tiny_frontier(self, spark):
        # (cost, score): frontier = (1,5), (2,7); (3,7) dominated by (2,7);
        # duplicate frontier point kept twice
        df = spark.createDataFrame(
            [(1, 1.0, 5), (2, 2.0, 7), (3, 2.0, 7), (4, 3.0, 7),
             (5, 2.5, 6), (6, 4.0, 1)],
            "id bigint, cost double, score int",
        )
        got = sorted(
            r.id for r in pareto_frontier_2d(df, "cost", "score").collect())
        assert got == [1, 2, 3]

    def test_all_equal_costs(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, 5), (2, 1.0, 9), (3, 1.0, 9)],
            "id bigint, cost double, score int",
        )
        got = sorted(
            r.id for r in pareto_frontier_2d(df, "cost", "score").collect())
        assert got == [2, 3]

    def test_matches_quadratic_reference(self, spark, sf_dir):
        part = spark.read.parquet(f"{sf_dir}/part.parquet") \
            .select("p_partkey", "p_retailprice", "p_size")
        rows = part.collect()
        ref = {
            p.p_partkey
            for p in rows
            if not any(
                (q.p_retailprice < p.p_retailprice and q.p_size >= p.p_size)
                or (q.p_retailprice <= p.p_retailprice and q.p_size > p.p_size)
                for q in rows
            )
        }
        got = {
            r.p_partkey
            for r in pareto_frontier_2d(part, "p_retailprice", "p_size").collect()
        }
        assert got == ref


class TestInterpolate:
    def test_midpoint_and_edges(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 10.0), ("a", 1, None), ("a", 2, None), ("a", 3, 40.0),
             ("a", 4, None),  # trailing gap -> stays NULL
             ("b", 0, None), ("b", 1, 7.0)],  # leading gap -> stays NULL
            "k string, x long, v double",
        )
        out = {
            (r.k, r.x): r.v_interp
            for r in interpolate_linear(df, "k", "x", "v").collect()
        }
        assert out[("a", 1)] == 20.0 and out[("a", 2)] == 30.0
        assert out[("a", 0)] == 10.0 and out[("a", 3)] == 40.0
        assert out[("a", 4)] is None and out[("b", 0)] is None


class TestEwma:
    def test_matches_python_reference(self, spark):
        data = [(1, i, float((i * 37) % 11)) for i in range(20)]
        df = spark.createDataFrame(data, "k bigint, ts long, v double")
        got = {
            r.ts: r.ewma_value
            for r in ewma(df, "k", "ts", "v", alpha=0.25).collect()
        }
        e = None
        for _k, ts, v in data:
            e = v if e is None else 0.25 * v + 0.75 * e
            assert got[ts] == pytest.approx(e, abs=1e-12)


class TestFuzzyPairs:
    def test_blocked_matches(self, spark):
        df = spark.createDataFrame(
            [(1, "widget-01"), (2, "widget-02"),   # same block, dist 1
             (3, "widget-99"),                      # same block, dist 2 -> out
             (4, "gadget-01"),                      # different prefix block
             (5, "widget-013")],                    # different length block
            "id bigint, name string",
        )
        got = {(r.id1, r.id2): r.edit_dist
               for r in fuzzy_pairs_levenshtein(df, "id", "name").collect()}
        assert got == {(1, 2): 1}

    def test_max_dist_2(self, spark):
        df = spark.createDataFrame(
            [(1, "widget-01"), (3, "widget-99")], "id bigint, name string")
        got = fuzzy_pairs_levenshtein(df, "id", "name", max_dist=2).collect()
        assert [(r.id1, r.id2, r.edit_dist) for r in got] == [(1, 3, 2)]


class TestZscoreOutliers:
    def test_flags_only_outliers(self, spark):
        vals = [("g", float(v)) for v in [10, 11, 9, 10, 10, 11, 9, 10, 100]]
        df = spark.createDataFrame(vals, "g string, v double")
        out = zscore_outliers(df, ["g"], "v", threshold=2.0).collect()
        assert [r.v for r in out] == [100.0]
        assert out[0].zscore > 2.0

    def test_zero_variance_group_silent(self, spark):
        df = spark.createDataFrame(
            [("g", 5.0), ("g", 5.0), ("g", 5.0)], "g string, v double")
        assert zscore_outliers(df, ["g"], "v").count() == 0
