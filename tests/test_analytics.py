"""Unit tests for the advanced-analytics operators (SCD2/temporal, EWMA,
interpolation, Pareto frontier, fuzzy matching, z-score outliers) — edge
cases the DuckDB-oracle queries don't exercise."""

from __future__ import annotations

from datetime import datetime

import os

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

    def test_multi_column_key(self, spark):
        log = spark.createDataFrame(
            [("eu", 1, _ts("2024-01-01T00:00:00"), "a"),
             ("eu", 1, _ts("2024-01-02T00:00:00"), "b"),
             ("us", 1, _ts("2024-01-01T12:00:00"), "x")],
            "region string, k bigint, ts timestamp, attr string",
        )
        rows = {(r.region, r.k, r.version): r.attr
                for r in scd2_build(log, ["region", "k"], "ts").collect()}
        assert rows == {("eu", 1, 1): "a", ("eu", 1, 2): "b", ("us", 1, 1): "x"}

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


class TestSCD2Incremental:
    def test_batch_apply_equals_full_rebuild(self, spark, changelog):
        from aliyun_maxcompute_data_collectors_spark.operators.scd import (
            scd2_apply_batch,
        )
        rows = changelog.orderBy("ts").collect()
        first = spark.createDataFrame(rows[:3], changelog.schema)
        rest = spark.createDataFrame(rows[3:], changelog.schema)
        dim = scd2_build(first, "k", "ts")
        incr = scd2_apply_batch(dim, rest, "k", "ts")
        full = scd2_build(changelog, "k", "ts")
        key = lambda r: (r.k, r.version, r.attr, r.effective_from,
                         r.effective_to, r.is_current)
        assert sorted(map(key, incr.collect())) == sorted(map(key, full.collect()))

    def test_late_row_splices_history(self, spark, changelog):
        from aliyun_maxcompute_data_collectors_spark.operators.scd import (
            scd2_apply_batch,
        )
        dim = scd2_build(changelog, "k", "ts")
        late = spark.createDataFrame(
            [(1, _ts("2024-01-02T00:00:00"), "z"),   # lands between v1 and v2
             (9, _ts("2024-01-01T00:00:00"), "new")],  # brand-new key
            changelog.schema,
        )
        out = scd2_apply_batch(dim, late, "k", "ts")
        k1 = sorted([r for r in out.collect() if r.k == 1],
                    key=lambda r: r.version)
        assert [r.attr for r in k1] == ["a", "z", "b", "b", "c"]
        assert k1[0].effective_to == _ts("2024-01-02T00:00:00")  # v1 re-closed
        assert k1[1].effective_to == _ts("2024-01-03T00:00:00")
        assert {r.k for r in out.collect()} == {1, 2, 9}

    def test_replay_is_idempotent(self, spark, changelog):
        """foreachBatch is at-least-once: applying the SAME batch twice must
        yield the same dimension (batch rows already in the history are
        deduped, not double-spliced into zero-width versions)."""
        from aliyun_maxcompute_data_collectors_spark.operators.scd import (
            scd2_apply_batch,
        )
        rows = changelog.orderBy("ts").collect()
        first = spark.createDataFrame(rows[:3], changelog.schema)
        rest = spark.createDataFrame(rows[3:], changelog.schema)
        once = scd2_apply_batch(scd2_build(first, "k", "ts"), rest, "k", "ts")
        twice = scd2_apply_batch(once, rest, "k", "ts")
        key = lambda r: (r.k, r.version, r.attr, r.effective_from,
                         r.effective_to, r.is_current)
        assert sorted(map(key, twice.collect())) == sorted(map(key, once.collect()))

    def test_streaming_scd2_maintenance(self, spark, tmp_path):
        import json as _json

        from aliyun_maxcompute_data_collectors_spark.catalog import OdpsCatalog
        from aliyun_maxcompute_data_collectors_spark.streaming.sink import (
            run_to_completion,
            scd2_stream_writer,
        )
        src = tmp_path / "in"
        src.mkdir()
        # two files -> two micro-batches (maxFilesPerTrigger=1); the second
        # carries a LATE row for k=1
        with open(src / "b1.json", "w") as f:
            f.write(_json.dumps({"k": 1, "ts": "2024-01-01 00:00:00", "attr": "a"}) + "\n")
            f.write(_json.dumps({"k": 1, "ts": "2024-01-05 00:00:00", "attr": "c"}) + "\n")
        with open(src / "b2.json", "w") as f:
            f.write(_json.dumps({"k": 1, "ts": "2024-01-03 00:00:00", "attr": "b"}) + "\n")
            f.write(_json.dumps({"k": 2, "ts": "2024-01-02 00:00:00", "attr": "x"}) + "\n")

        cat = OdpsCatalog(spark, str(tmp_path / "wh"))
        cat.create_table("dim", [
            ("k", "BIGINT"), ("attr", "STRING"), ("version", "INT"),
            ("effective_from", "TIMESTAMP"), ("effective_to", "TIMESTAMP"),
            ("is_current", "BOOLEAN"),
        ])
        stream = (
            spark.readStream.schema("k long, ts string, attr string")
            .option("maxFilesPerTrigger", "1").json(str(src))
            .withColumn("ts", F.to_timestamp("ts"))
        )
        writer = scd2_stream_writer(stream, cat, "dim", str(tmp_path / "ck"),
                                    keys=["k"], time_col="ts")
        run_to_completion(writer)
        got = {(r.k, r.version): (r.attr, r.is_current)
               for r in cat.read_table("dim").collect()}
        assert got == {
            (1, 1): ("a", False), (1, 2): ("b", False), (1, 3): ("c", True),
            (2, 1): ("x", True),
        }


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


class TestIncrementalAgg:
    def test_merged_partials_equal_direct_agg(self, spark, sf_dir):
        from aliyun_maxcompute_data_collectors_spark.operators.incremental import (
            merge_partials,
            partial_agg,
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
            "one", F.lit(1))
        specs = {
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "one"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        }
        # three disjoint slices, as if arriving as daily batches
        slices = [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
        merged = merge_partials(
            [partial_agg(s, ["l_returnflag"], specs) for s in slices],
            ["l_returnflag"], specs)
        direct = partial_agg(li, ["l_returnflag"], specs)
        key = lambda r: (r.l_returnflag, r.sum_qty, r.n_rows,
                         r.min_price, r.max_price)
        assert sorted(map(key, merged.collect())) == \
            sorted(map(key, direct.collect()))

    def test_hll_sketch_partials_merge_losslessly(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.incremental import (
            finalize_sketches,
            merge_partials,
            partial_agg,
        )
        df = spark.range(20000).select(
            (F.col("id") % 4).alias("g"), (F.col("id") % 3000).alias("u"))
        specs = {"users": ("approx_distinct", "u")}
        slices = [df.where(F.col("id") % 3 == i) for i in range(3)]
        merged = finalize_sketches(
            merge_partials([partial_agg(s, ["g"], specs) for s in slices],
                           ["g"], specs), specs)
        direct = finalize_sketches(partial_agg(df, ["g"], specs), specs)
        m = {r.g: r.users for r in merged.collect()}
        d = {r.g: r.users for r in direct.collect()}
        exact = {r.g: r.x for r in
                 df.groupBy("g").agg(F.count_distinct("u").alias("x")).collect()}
        # merged partials and one-shot sketching both land inside the
        # sketch's error envelope (union isn't bit-identical to one-shot -
        # sparse/dense promotion differs - but accuracy is preserved)
        for est in (m, d):
            for g, v in est.items():
                assert abs(v - exact[g]) / exact[g] < 0.05

    def test_rejects_non_mergeable(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.incremental import (
            partial_agg,
        )
        df = spark.range(3)
        with pytest.raises(ValueError, match="non-mergeable"):
            partial_agg(df, [], {"d": ("count_distinct", "id")})


class TestFunnelMaxGap:
    def test_gap_breaks_funnel(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.relational import funnel
        ev = spark.createDataFrame(
            [(1, _ts("2024-01-01T00:00:00"), "a"),
             (1, _ts("2024-01-02T00:00:00"), "b"),     # within 2 days of a
             (2, _ts("2024-01-01T00:00:00"), "a"),
             (2, _ts("2024-01-09T00:00:00"), "b")],    # 8 days later -> breaks
            "u bigint, ts timestamp, et string",
        )
        steps = [F.col("et") == "a", F.col("et") == "b"]
        strict = {r.u: r.step_2
                  for r in funnel(ev, "u", "ts", steps, max_gap="2 days").collect()}
        assert strict[1] is not None and strict[2] is None
        loose = {r.u: r.step_2 for r in funnel(ev, "u", "ts", steps).collect()}
        assert loose[2] is not None


class TestStreamingEwma:
    def test_running_ewma_across_batches(self, spark, tmp_path):
        import json as _json

        from aliyun_maxcompute_data_collectors_spark.streaming.sink import (
            run_to_completion,
        )
        from aliyun_maxcompute_data_collectors_spark.streaming.stateful import (
            running_ewma,
        )
        src = tmp_path / "in"
        src.mkdir()
        vals = [10.0, 20.0, 30.0, 40.0]
        # two files -> two micro-batches; state must carry across them.
        # explicit mtimes: the file source takes oldest-first, and same-ms
        # creation would make batch order (hence the recurrence) ambiguous
        for fi, chunk in enumerate([vals[:2], vals[2:]]):
            p = src / f"b{fi}.json"
            with open(p, "w") as f:
                for i, v in enumerate(chunk):
                    f.write(_json.dumps(
                        {"k": 1, "seq": fi * 2 + i, "v": v}) + "\n")
            os.utime(p, (1700000000 + fi * 60, 1700000000 + fi * 60))
        stream = spark.readStream.schema("k long, seq long, v double") \
            .option("maxFilesPerTrigger", "1").json(str(src))
        out_rows = []
        q = (running_ewma(stream, ["k"], "seq", "v", alpha=0.5)
             .writeStream.format("memory").queryName("ewma_out")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM ewma_out ORDER BY n_events").collect()
        # recurrence: 10 -> 15 -> 22.5 -> 31.25; batch emissions at n=2, n=4
        got = {r.n_events: r.ewma_value for r in rows}
        assert got[2] == pytest.approx(15.0)
        assert got[4] == pytest.approx(31.25)


class TestHeavyHitters:
    def test_exact_and_superset_guarantee(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.corpus import (
            heavy_hitters,
        )
        # 10k rows: 'hot' 30%, 'warm' 12%, long tail of 5.8k distinct items
        rows = (["hot"] * 3000 + ["warm"] * 1200
                + [f"tail{i}" for i in range(5800)])
        df = spark.createDataFrame([(x,) for x in rows], "item string") \
            .repartition(8)
        got = {r.item: r.cnt
               for r in heavy_hitters(df, "item", phi=0.1, capacity=16).collect()}
        assert got == {"hot": 3000, "warm": 1200}  # exact counts, no tail

    def test_tiny_capacity_still_exact(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.corpus import (
            heavy_hitters,
        )
        rows = ["a"] * 60 + ["b"] * 25 + [f"t{i}" for i in range(15)]
        df = spark.createDataFrame([(x,) for x in rows], "item string") \
            .repartition(4)
        got = {r.item for r in heavy_hitters(df, "item", phi=0.2).collect()}
        assert got == {"a", "b"}

    def test_null_items_excluded_consistently(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.corpus import (
            heavy_hitters,
        )
        # NULL is 50% of raw rows; it must not appear as a hitter AND must
        # not inflate the denominator (N counts non-NULL items only).
        rows = [("a",)] * 8 + [("b",)] * 2 + [(None,)] * 10
        df = spark.createDataFrame(rows, "item string").repartition(3)
        got = {r.item: r.cnt for r in heavy_hitters(df, "item", phi=0.5).collect()}
        assert got == {"a": 8}  # 8/10 non-null >= 0.5; NULL absent

    def test_per_group_hitters_survive_group_size_skew(self, spark):
        from aliyun_maxcompute_data_collectors_spark.operators.corpus import (
            heavy_hitters_per_group,
        )
        # 'big' group: 6000 rows of long tail + one 20% hitter.
        # 'small' group: 20 rows, one item at 50% — far below any GLOBAL
        # count threshold; a single concatenated-stream MG sketch would
        # evict it.  Per-group sketches must keep it at default capacity.
        rows = ([("big", "bh")] * 1200
                + [("big", f"t{i}") for i in range(4800)]
                + [("small", "sh")] * 10
                + [("small", f"u{i}") for i in range(10)])
        df = spark.createDataFrame(rows, "g string, item string").repartition(8)
        got = {(r.g, r.item): r.cnt
               for r in heavy_hitters_per_group(df, "g", "item", phi=0.15).collect()}
        assert got == {("big", "bh"): 1200, ("small", "sh"): 10}


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


def test_gapfill_interpolated_equals_unfused(spark):
    """The fused grid+interp operator must be row-identical to the
    resample_fill -> interpolate_linear composition it replaces."""
    from aliyun_maxcompute_data_collectors_spark.operators.timeseries import (
        gapfill_interpolated, interpolate_linear, resample_fill)

    rows = [
        (1, "2024-01-01 00:10:00", 1.0),   # obs bucket 0
        (1, "2024-01-01 03:20:00", 7.0),   # gap of 2 buckets before this
        (1, "2024-01-01 04:05:00", 2.5),   # adjacent bucket
        (2, "2024-01-01 00:00:00", 10.0),  # single-obs key: one row, no gaps
        (1, "2024-01-01 00:40:00", 0.25),  # second event in bucket 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")

    fused = gapfill_interpolated(df, "user_id", "ts", "value", 3600)
    grid = resample_fill(df, "user_id", "ts", "value", 3600)
    unfused = interpolate_linear(grid, "user_id", "bucket_start", "bucket_sum") \
        .select("user_id", "bucket_start", "n_events", "bucket_sum",
                "bucket_sum_interp")

    key = lambda r: (r["user_id"], r["bucket_start"])
    f = {key(r): r.asDict() for r in fused.collect()}
    u = {key(r): r.asDict() for r in unfused.collect()}
    assert f == u
    # gap rows really are interpolated: bucket 1 and 2 of user 1 sit on the
    # line between 1.25 (bucket 0) and 7.0 (bucket 3)
    assert f[(1, 1704070800)]["bucket_sum_interp"] == 1.25 + (7.0 - 1.25) / 3
    assert f[(1, 1704070800)]["n_events"] == 0


def test_resample_fill_fused_semantics(spark):
    """Fused resample_fill keeps the original composition's semantics,
    including the all-NULL-value bucket corner (is_gap, carry-forward)."""
    from aliyun_maxcompute_data_collectors_spark.operators.timeseries import resample_fill

    rows = [
        (1, "2024-01-01 00:15:00", 2.0),
        (1, "2024-01-01 02:30:00", None),   # observed bucket, NULL sum
        (1, "2024-01-01 04:45:00", 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {r["bucket_start"]: r.asDict()
           for r in resample_fill(df, "user_id", "ts", "value", 3600).collect()}
    assert len(out) == 5  # dense hourly grid 00..04
    b0 = 1704067200
    assert out[b0]["n_events"] == 1 and out[b0]["filled_sum"] == 2.0
    assert not out[b0]["is_gap"]
    # pure gap bucket: zero events, carries 2.0
    assert out[b0 + 3600]["n_events"] == 0 and out[b0 + 3600]["is_gap"]
    assert out[b0 + 3600]["filled_sum"] == 2.0
    # observed bucket with NULL sum: event counted, still a gap, carries 2.0
    assert out[b0 + 2 * 3600]["n_events"] == 1
    assert out[b0 + 2 * 3600]["is_gap"]
    assert out[b0 + 2 * 3600]["bucket_sum"] is None
    assert out[b0 + 2 * 3600]["filled_sum"] == 2.0
    assert out[b0 + 4 * 3600]["filled_sum"] == 8.0


def test_recursive_chain_scopes_row_valve(spark, sf_dir, monkeypatch):
    """ADVICE/VERDICT r6: recursive_chain raises cteRecursionRowLimit for
    its own (provably finite) recursion but must restore the session value
    - a leaked valve would silently disable the runaway-row guard for
    every later recursive query in the shared driver session.  The result
    must stay collectable AFTER the restore (materialized eagerly).
    r13: the driver fast path never touches the valve, so this test pins
    the admission bound to -1 to force the NATIVE recursion it guards."""
    import aliyun_maxcompute_data_collectors_spark.queries_analytics as QA

    monkeypatch.setattr(QA, "RECURSIVE_DRIVER_MAX_BYTES", -1)
    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key)
    df = QA.recursive_chain(spark, sf_dir)
    assert spark.conf.get(key) == before
    assert df.count() > 0
    assert spark.conf.get(key) == before


def test_recursive_chain_driver_path_matches_native(spark, sf_dir,
                                                    monkeypatch):
    """r13: the small-table driver fixed point must produce EXACTLY the
    native WITH RECURSIVE result - rows and schema."""
    import aliyun_maxcompute_data_collectors_spark.queries_analytics as QA

    fast = QA.recursive_chain(spark, sf_dir)
    monkeypatch.setattr(QA, "RECURSIVE_DRIVER_MAX_BYTES", -1)
    native = QA.recursive_chain(spark, sf_dir)
    assert [(f.name, f.dataType) for f in fast.schema] == \
        [(f.name, f.dataType) for f in native.schema]
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b
