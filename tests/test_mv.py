"""Incremental materialized-view maintenance (mv.py): every refresh must
equal a full re-aggregate of the current source snapshot, across commit
shapes (append fast path, overwrite deletes, merge), both strategies
(signed merge / touched-key rescope), and the SQL edge semantics
(null keys, all-null value groups, group disappearance)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.mv import MaterializedAggView
from aliyun_maxcompute_data_collectors_spark.session import load_tables
from aliyun_maxcompute_data_collectors_spark.snapshots import SnapshotTable

_DEC = "CAST(o_totalprice AS DECIMAL(18,6))"


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="mv_t_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def orders(spark, sf_dir):
    return load_tables(spark, sf_dir, ["orders"])["orders"].select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 10).cast("int").alias("bucket"))


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mv_merge_path_tracks_every_commit_shape(spark, orders, root):
    b = F.col("bucket")
    src = SnapshotTable.init(spark, os.path.join(root, "src"))
    src.append(orders.where(b < 4))
    mv = MaterializedAggView.init(
        spark, src, os.path.join(root, "st"), keys=["bucket"],
        aggs={"n": ("count", ""), "total": ("sum", _DEC),
              "avg_price": ("avg", _DEC)})
    assert mv.refresh() == ("merge", 2)
    assert _same(mv.read(), mv.full_recompute())
    src.append(orders.where((b >= 4) & (b < 7)))     # CDF fast path
    assert mv.refresh() == ("merge", 3)
    assert _same(mv.read(), mv.full_recompute())
    # overwrite: bucket 0 disappears entirely, bucket 1 halves
    src.overwrite(src.read().where(
        (b != 0) & ~((b == 1) & (F.col("o_orderkey") % 20 == 1))))
    assert mv.refresh() == ("merge", 4)
    assert _same(mv.read(), mv.full_recompute())
    # group liveness: the emptied key LEFT the view, not sum=0 residue
    assert mv.read().where(b == 0).count() == 0
    assert mv.refresh() == ("noop", 4)
    # MERGE INTO on the source folds in too (update+delete+insert)
    m = F.col("o_orderkey") % 10
    srcrows = orders.where((m >= 3) & (m <= 8)).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "bucket")
    src.merge(srcrows, "t.o_orderkey = s.o_orderkey",
              matched=[("s.o_orderkey % 10 = 4", "delete"),
                       (None, {"o_totalprice": "s.o_totalprice"})],
              not_matched=(None, "*"))
    assert mv.refresh()[0] == "merge"
    assert _same(mv.read(), mv.full_recompute())


def test_mv_rescope_path_minmax_with_deletes(spark, orders, root):
    b = F.col("bucket")
    src = SnapshotTable.init(spark, os.path.join(root, "src"))
    src.append(orders.where(b < 6))
    mv = MaterializedAggView.init(
        spark, src, os.path.join(root, "st"), keys=["bucket"],
        aggs={"lo": ("min", "o_totalprice"), "hi": ("max", "o_totalprice"),
              "n": ("count", "")})
    assert mv.refresh()[0] == "rescope"
    assert _same(mv.read(), mv.full_recompute())
    # delete the current MAX rows of every bucket: only a recompute of
    # touched keys can get the new max right (subtraction cannot)
    hi = (src.read().groupBy("bucket")
          .agg(F.max("o_totalprice").alias("mx")))
    src.overwrite(src.read().alias("r").join(
        hi.alias("h"),
        (F.col("r.bucket") == F.col("h.bucket"))
        & (F.col("r.o_totalprice") == F.col("h.mx")), "left_anti"))
    assert mv.refresh()[0] == "rescope"
    assert _same(mv.read(), mv.full_recompute())


def test_mv_null_keys_and_all_null_values(spark, root):
    src = SnapshotTable.init(spark, os.path.join(root, "src"))
    rows1 = [(1, None, 10.0), (2, None, 20.0), (3, "a", None),
             (4, "a", None), (5, "b", 5.0)]
    df = spark.createDataFrame(rows1, "id int, k string, v double")
    src.append(df)
    mv = MaterializedAggView.init(
        spark, src, os.path.join(root, "st"), keys=["k"],
        aggs={"n": ("count", ""), "s": ("sum", "v")})
    mv.refresh()
    got = {r["k"]: (r["n"], r["s"]) for r in mv.read().collect()}
    # NULL is a key value (groupBy semantics); the all-null group sums
    # to SQL NULL, never 0
    assert got == {None: (2, 30.0), "a": (2, None), "b": (1, 5.0)}
    # second batch gives the all-null group a value, deletes NULL-key rows
    src.overwrite(spark.createDataFrame(
        [(3, "a", None), (4, "a", None), (6, "a", 7.0), (5, "b", 5.0)],
        "id int, k string, v double"))
    assert mv.refresh()[0] == "merge"
    got = {r["k"]: (r["n"], r["s"]) for r in mv.read().collect()}
    assert got == {"a": (3, 7.0), "b": (1, 5.0)}
    assert _same(mv.read(), mv.full_recompute())


def test_mv_watermark_rides_the_state_commit(spark, orders, root):
    src = SnapshotTable.init(spark, os.path.join(root, "src"))
    src.append(orders.limit(100))
    mv = MaterializedAggView.init(
        spark, src, os.path.join(root, "st"), keys=["bucket"],
        aggs={"n": ("count", "")})
    assert mv.base_version() == 1  # nothing folded yet
    mv.refresh()
    assert mv.base_version() == 2
    ops = [v["operation"] for v in mv.state.versions()]
    assert ops[-1] == "mv-refresh:base=2"  # atomic with the state data
    # a reopened handle recovers the watermark from the commit log alone
    mv2 = MaterializedAggView(
        spark, src, os.path.join(root, "st"), keys=["bucket"],
        aggs={"n": ("count", "")})
    assert mv2.base_version() == 2
    assert mv2.refresh() == ("noop", 2)


def test_mv_rejects_unknown_kind(spark, orders, root):
    src = SnapshotTable.init(spark, os.path.join(root, "src"))
    with pytest.raises(ValueError):
        MaterializedAggView.init(
            spark, src, os.path.join(root, "st"), keys=["bucket"],
            aggs={"x": ("median", "o_totalprice")})
