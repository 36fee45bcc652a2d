"""Driver-oracle registry queries for the snapshot/transaction layer.

VERDICT r6 ask #1: ``snapshots.py`` (atomic manifest commit, time travel,
rollback, CDF-style ``changes()``, OPTIMIZE-style compaction - reference
parity anchor: spark-connector OdpsBatchWrite.scala:42-95 atomic commit
semantics) shipped in round 6 with pytest-only evidence.  These queries
put every headline capability under the strongest instrument available -
the driver's DuckDB row/schema/hash oracle:

- ``snapshot_time_travel``: three committed versions (append, append,
  rollback), each version read back and aggregated.  The oracle
  recomputes the same deterministic fixture slices straight from the
  ``orders`` view - if snapshot isolation, the manifest file lists, or
  rollback republishing were wrong, the per-version sums diverge.
- ``snapshot_changes``: one append step (exercises the metadata-only
  "new files" fast path) and one overwrite step (exercises the exceptAll
  multiset-diff path), both aggregated per (step, change_type).
- ``snapshot_compact``: three small-file appends, then OPTIMIZE-style
  bin-packing; HEAD after compaction must preserve every row bit-for-bit
  and the version count pins that compaction COMMITS (history grows,
  nothing is rewritten in place).
- ``snapshot_pruned_read``: manifest-based data skipping - a range read
  over disjoint key-range files must prune to one file from [min, max]
  stats alone, with the scanned-file count AND the row aggregate both
  under the hash oracle.

Each query builds its snapshot table in a throwaway temp dir from
deterministic modulo slices of ``orders``, materializes the (tiny,
aggregate-sized) result eagerly, and removes the dir - the returned
DataFrame reads checkpointed partitions, so the driver's later collect
never touches the deleted files.  At 100 TB the same operations run
against a durable table root; the temp dir is test scaffolding, not the
design (see snapshots.py for the object-store caveats).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_maxcompute_data_collectors_spark.session import load_tables
from aliyun_maxcompute_data_collectors_spark.snapshots import SnapshotTable

_DEC = "decimal(18,6)"


def _slices(spark: SparkSession, sf_dir: str):
    """Deterministic fixture slices of orders: a = keys ending 0-4,
    b = keys ending 5-7, c = keys ending 8 (keys are unique, so every
    multiset below is a set and exceptAll diffs are exact)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
        "o_orderkey", "o_totalprice")
    m = F.col("o_orderkey") % 10
    return (o.where(m < 5), o.where((m >= 5) & (m < 8)), o.where(m == 8))


def _ver_agg(df: DataFrame, version: int) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
        .cast("double").alias("sum_price"),
    ).select(F.lit(version).alias("version"), "n_rows", "sum_key",
             "sum_price")


def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``init`` commits v1 (empty), then v2 = append(a), v3 = append(b),
    v4 = rollback(v2).  Reading each version must reproduce exactly the
    slice algebra the oracle computes from the raw table: v2 = a,
    v3 = a+b, v4 (HEAD) = a again."""
    root = tempfile.mkdtemp(prefix="snap_tt_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)     # v1 (empty init)
        va = tab.append(a)                        # v2
        vb = tab.append(b)                        # v3
        vr = tab.rollback(va)                     # v4 republishes v2's files
        out = (_ver_agg(tab.read(va), va)
               .unionByName(_ver_agg(tab.read(vb), vb))
               .unionByName(_ver_agg(tab.read(), vr)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_TIME_TRAVEL_SQL = """
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 < 5),
     b AS (SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 10 BETWEEN 5 AND 7),
     v2 AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT 2 AS version, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM a
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
FROM v2
UNION ALL
SELECT 4, COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
FROM a
"""


def snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF over two commit shapes: v1->v2 is an append, so ``changes``
    takes the metadata-only fast path (reads ONLY the new files - the
    100 TB incremental-consumption shape); v2->v3 is an overwrite back
    to slice a, so it takes the exceptAll diff path and must report
    exactly slice b as deletes."""
    root = tempfile.mkdtemp(prefix="snap_cdf_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)  # v1 (empty init)
        va = tab.append(a)   # v2
        vb = tab.append(b)   # v3  (fast path: only b's files are new)
        vo = tab.overwrite(a)  # v4  (diff path: b disappears)

        def _step(df: DataFrame, step: str) -> DataFrame:
            return (df.groupBy(F.col("_change_type").alias("change_type"))
                    .agg(F.count(F.lit(1)).alias("n_rows"),
                         F.sum("o_orderkey").cast("long").alias("sum_key"))
                    .select(F.lit(step).alias("step"), "change_type",
                            "n_rows", "sum_key"))

        out = (_step(tab.changes(va, vb), "v1_v2")
               .unionByName(_step(tab.changes(vb, vo), "v2_v3")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_CHANGES_SQL = """
WITH b AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 BETWEEN 5 AND 7)
SELECT 'v1_v2' AS step, 'insert' AS change_type, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM b
UNION ALL
SELECT 'v2_v3', 'delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
FROM b
"""


def snapshot_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three small-file appends then OPTIMIZE-style compaction.  HEAD
    after compacting must hold exactly a+b+c (row preservation is the
    whole point of the pre-commit row-count check), and the version
    count pins that compaction COMMITS a new snapshot (v5) rather than
    rewriting history in place."""
    root = tempfile.mkdtemp(prefix="snap_opt_")
    try:
        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)  # v1 (empty init)
        tab.append(a)   # v2
        tab.append(b)   # v3
        tab.append(c)   # v4 - three commits of parquet files far below
        tab.compact()   # the 64MB small-file bar -> all bin-packed, v5
        n_versions = len(tab.versions())
        out = tab.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"),
        ).select("n_rows", "sum_key", "sum_price",
                 F.lit(n_versions).alias("n_versions"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_COMPACT_SQL = """
WITH u AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <= 8)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       5 AS n_versions
FROM u
"""


def snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-based data skipping (r7): three appends of disjoint
    key-range slices (one file each), then a range read that must prune
    to exactly ONE file from manifest [min, max] stats alone -
    ``n_files_scanned`` pins the prune in the hash oracle, and the row
    aggregate pins that pruning never changed the answer.  The
    Iceberg-manifest-stats shape: planning is O(files) driver metadata,
    zero data IO."""
    root = tempfile.mkdtemp(prefix="snap_prune_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        mx = o.agg(F.max("o_orderkey")).collect()[0][0]
        b1, b2 = mx // 3, (2 * mx) // 3
        lo, hi = b1 // 2, b1 - 1
        tab = SnapshotTable.init(spark, root)
        k = F.col("o_orderkey")
        tab.append(o.where(k <= b1).coalesce(1))
        tab.append(o.where((k > b1) & (k <= b2)).coalesce(1))
        tab.append(o.where(k > b2).coalesce(1))
        conj = [("o_orderkey", "between", (lo, hi))]
        n_scanned = len(tab.prune_files(tab.manifest(), conj))
        out = tab.read(where=conj[0]).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"),
        ).select("n_rows", "sum_key", "sum_price",
                 F.lit(n_scanned).alias("n_files_scanned"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PRUNED_READ_SQL = """
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
     pred AS (SELECT (m // 3) // 2 AS lo, (m // 3) - 1 AS hi FROM mx)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       1 AS n_files_scanned
FROM orders, pred
WHERE o_orderkey BETWEEN pred.lo AND pred.hi
"""


def snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional ANSI MERGE on a snapshot table (r7): target = keys
    ending 0-4, source = keys ending 3-6 at doubled price; WHEN MATCHED
    deletes key%10==4, otherwise updates the price; WHEN NOT MATCHED
    inserts (keys ending 5-6).  HEAD after the one-commit merge must hold
    exactly the clause algebra the oracle recomputes per key bucket."""
    root = tempfile.mkdtemp(prefix="snap_merge_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        m = F.col("o_orderkey") % 10
        tab = SnapshotTable.init(spark, root)
        tab.append(o.where(m < 5))
        src = (o.where((m >= 3) & (m <= 6))
               .select("o_orderkey",
                       (F.col("o_totalprice") * 2).alias("o_totalprice")))
        tab.merge(
            src, "t.o_orderkey = s.o_orderkey",
            matched=[("s.o_orderkey % 10 = 4", "delete"),
                     (None, {"o_totalprice": "s.o_totalprice"})],
            not_matched=(None, "*"))
        out = (tab.read()
               .groupBy(m.cast("int").alias("bucket"))
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").cast("long").alias("sum_key"),
                    F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                    .cast("double").alias("sum_price")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MERGE_SQL = """
WITH res AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 IN (0, 1, 2)
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2 FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2 FROM orders WHERE o_orderkey % 10 IN (5, 6)
)
SELECT CAST(o_orderkey % 10 AS INT) AS bucket, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM res
GROUP BY bucket
"""


def pyds_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python Data Source front-end (sources/pyds.py) under the hash
    oracle, covering BOTH directions of the DSv2 surface on a plain
    ``format("graft_snapshot")`` path:

    - WRITE: three disjoint key-range slices committed through Spark's
      DSv2 commit protocol (``df.write.format(...).mode("append")`` -
      task files invisible until the driver's commit publishes a
      manifest; one file per append via coalesce(1));
    - READ with FILTER PUSHDOWN: a range predicate on the DataFrame must
      produce exact rows, and the reader-level ``pushFilters`` planning
      must prune the scan to ONE file from manifest [min, max] stats
      alone - ``n_files_scanned`` pins the prune inside the hash.

    The pushdown conf is scoped (set + unset-aware restore) so the
    shared driver session sees no conf diff."""
    import tempfile as _tf

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from aliyun_maxcompute_data_collectors_spark.session import scoped_sql_conf
    from aliyun_maxcompute_data_collectors_spark.sources.pyds import (
        GraftSnapshotDataSource,
        register_python_datasources,
    )

    root = _tf.mkdtemp(prefix="snap_pyds_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        mx = o.agg(F.max("o_orderkey")).collect()[0][0]
        b1, b2 = mx // 3, (2 * mx) // 3
        lo, hi = b1 // 2, b1 - 1
        SnapshotTable.init(spark, root)
        register_python_datasources(spark)
        k = F.col("o_orderkey")
        with scoped_sql_conf(
                spark, "spark.sql.python.filterPushdown.enabled", "true"):
            for sl in (o.where(k <= b1), o.where((k > b1) & (k <= b2)),
                       o.where(k > b2)):
                (sl.coalesce(1).write.format("graft_snapshot")
                 .option("path", root).mode("append").save())
            ds = GraftSnapshotDataSource({"path": root})
            rdr = ds.reader(ds.schema())
            rdr.pushFilters([GreaterThanOrEqual(("o_orderkey",), int(lo)),
                             LessThanOrEqual(("o_orderkey",), int(hi))])
            n_scanned = len(rdr._files)
            out = (spark.read.format("graft_snapshot").option("path", root)
                   .load().where(k.between(int(lo), int(hi)))
                   .agg(F.count(F.lit(1)).alias("n_rows"),
                        F.sum("o_orderkey").cast("long").alias("sum_key"),
                        F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                        .cast("double").alias("sum_price"))
                   .select("n_rows", "sum_key", "sum_price",
                           F.lit(n_scanned).alias("n_files_scanned")))
            return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PYDS_SNAPSHOT_SQL = """
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
     pred AS (SELECT (m // 3) // 2 AS lo, (m // 3) - 1 AS hi FROM mx)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       1 AS n_files_scanned
FROM orders, pred
WHERE o_orderkey BETWEEN pred.lo AND pred.hi
"""


def pyds_avro_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``format("graft_avro")`` under the hash oracle: one container file
    written by write_avro, then read back through the Python Data Source
    with sync-marker SPLITTING (>= 4 byte-range tasks over the single
    file).  Exact row count and decimal-exact sums pin that range
    ownership neither drops nor duplicates any block; the split count is
    asserted (not emitted - file size varies with sf)."""
    import glob as _glob
    import os as _os
    import tempfile as _tf

    from aliyun_maxcompute_data_collectors_spark.sources.avrofile import write_avro

    adir = _tf.mkdtemp(prefix="avro_pyds_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        write_avro(o.coalesce(1), adir)
        f = _glob.glob(_os.path.join(adir, "*.avro"))[0]
        split = max(1, _os.path.getsize(f) // 4)
        from aliyun_maxcompute_data_collectors_spark.sources.pyds import (
            GraftAvroDataSource,
            register_python_datasources,
        )
        register_python_datasources(spark)
        _, _, ranges = GraftAvroDataSource(
            {"path": f, "split_bytes": str(split)})._plan()
        if len(ranges) < 4:
            raise AssertionError("graft_avro split planning produced <4 tasks")
        av = (spark.read.format("graft_avro").option("path", f)
              .option("split_bytes", str(split)).load())
        out = av.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(adir, ignore_errors=True)


_PYDS_AVRO_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM orders
"""


def pyds_stream_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING under the hash oracle - both directions of
    the snapshot streaming surface in one deterministic cycle:

    1. SOURCE: a snapshot table receives two append commits (slices a,
       b); ``readStream.format("graft_snapshot")`` replays from v1 with
       availableNow and lands in a parquet sink - every appended row
       must stream exactly once (version offsets + immutable file sets).
    2. SINK: the parquet output is file-streamed BACK through
       ``writeStream.format("graft_snapshot")`` into a second snapshot
       table - one batch-id-tagged atomic commit.

    The final read of table 2's HEAD must equal a+b exactly; the oracle
    recomputes the slices from ``orders``.  A dropped or duplicated
    micro-batch, a mis-planned version range, or a broken epoch commit
    all change the count/sum hash.  Output also pins the sink table's
    commit history shape (init + one stream-append epoch)."""
    import os as _os
    import tempfile as _tf

    from aliyun_maxcompute_data_collectors_spark.sources.pyds import (
        register_python_datasources,
    )

    root = _tf.mkdtemp(prefix="snap_stream_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        src_tab = SnapshotTable.init(spark, _os.path.join(root, "src"))
        src_tab.append(a)
        src_tab.append(b)
        register_python_datasources(spark)
        mid = _os.path.join(root, "mid")
        sdf = (spark.readStream.format("graft_snapshot")
               .option("path", src_tab.path)
               .option("starting_version", "1").load())
        q1 = (sdf.writeStream.format("parquet").option("path", mid)
              .option("checkpointLocation", _os.path.join(root, "ck1"))
              .trigger(availableNow=True).start())
        q1.awaitTermination(120)
        dst_tab = SnapshotTable.init(spark, _os.path.join(root, "dst"))
        fstream = spark.readStream.schema(a.schema).parquet(mid)
        q2 = (fstream.writeStream.format("graft_snapshot")
              .option("path", dst_tab.path)
              .option("checkpointLocation", _os.path.join(root, "ck2"))
              .trigger(availableNow=True).start())
        q2.awaitTermination(120)
        ops = [v["operation"] for v in dst_tab.versions()]
        n_epochs = sum(op.startswith("stream-append") for op in ops)
        out = dst_tab.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"),
        ).select("n_rows", "sum_key", "sum_price",
                 F.lit(int(n_epochs)).alias("n_stream_epochs"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PYDS_STREAM_SQL = """
WITH ab AS (SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 10 < 8)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       1 AS n_stream_epochs
FROM ab
"""


def mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (mv.py) under the hash
    oracle: a per-bucket count/sum view over a snapshot table is
    refreshed through THREE commit shapes - append (CDF fast path),
    another append, then an overwrite that deletes bucket 0 and half of
    bucket 1 (signed-merge delete handling + group-liveness drop).  The
    final view must equal a direct aggregate of the final table state,
    which is exactly what the oracle computes; a wrong signed fold, a
    lingering dead group, or a missed delta all break the hash.
    ``n_merge_refreshes`` pins that every refresh took the incremental
    merge path (never a silent full recompute)."""
    import os as _os
    import tempfile as _tf

    from aliyun_maxcompute_data_collectors_spark.mv import MaterializedAggView

    root = _tf.mkdtemp(prefix="mv_q_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice",
            (F.col("o_orderkey") % 10).cast("int").alias("bucket"))
        b = F.col("bucket")
        src = SnapshotTable.init(spark, _os.path.join(root, "src"))
        mv = MaterializedAggView.init(
            spark, src, _os.path.join(root, "state"), keys=["bucket"],
            aggs={"n": ("count", ""),
                  "total": ("sum", f"CAST(o_totalprice AS {_DEC})")})
        strategies = []
        src.append(o.where(b < 4))
        strategies.append(mv.refresh()[0])
        src.append(o.where((b >= 4) & (b < 7)))
        strategies.append(mv.refresh()[0])
        src.overwrite(src.read().where(
            (b != 0) & ~((b == 1) & (F.col("o_orderkey") % 20 == 1))))
        strategies.append(mv.refresh()[0])
        n_merge = sum(s == "merge" for s in strategies)
        out = mv.read().select(
            "bucket", "n",
            F.round("total", 2).cast("double").alias("total"),
            F.lit(int(n_merge)).alias("n_merge_refreshes"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MV_REFRESH_SQL = """
WITH final AS (
  SELECT o_orderkey, o_totalprice,
         CAST(o_orderkey % 10 AS INT) AS bucket
  FROM orders
  WHERE o_orderkey % 10 BETWEEN 1 AND 6
    AND NOT (o_orderkey % 10 = 1 AND o_orderkey % 20 = 1)
)
SELECT bucket, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total,
       3 AS n_merge_refreshes
FROM final GROUP BY bucket
"""


def snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive SCHEMA EVOLUTION under the hash oracle: an append adds a
    ``region_id`` column to an existing 2-column table; the unified read
    (driven by the manifest schema, no footer merging) must surface the
    pre-evolution rows with NULL and the post-evolution rows with their
    values - the per-region aggregate against a CASE-reconstructed
    oracle breaks if either cohort leaks into the other, if the unified
    schema misorders, or if NULL materialization is wrong."""
    import os as _os
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="snap_evo_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        m = F.col("o_orderkey") % 10
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(o.where(m < 4))
        tab.append(o.where((m >= 4) & (m < 8))
                   .withColumn("region_id", (m % 3).cast("int")))
        out = (tab.read()
               .groupBy("region_id")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").cast("long").alias("sum_key"),
                    F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                    .cast("double").alias("sum_price")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SCHEMA_EVOLUTION_SQL = """
SELECT CASE WHEN o_orderkey % 10 BETWEEN 4 AND 7
            THEN CAST((o_orderkey % 10) % 3 AS INT) END AS region_id,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 10 < 8
GROUP BY region_id
"""


def snapshot_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER under the hash oracle: a shuffled 8-file append
    (stats useless for range predicates - the prune count pins that ALL
    files scan) is clustered on (o_orderkey, o_custkey); afterwards a
    2-D box predicate must skip files from manifest stats alone
    (``pruned_after_cluster``) while the pruned read's row aggregate
    stays exact - the oracle recomputes the box from ``orders``
    directly.  Exact post-cluster file counts depend on range-partition
    sample boundaries, so the HASHED claim is the boolean plus the
    exact rows, not a boundary-sensitive count."""
    import os as _os
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="snap_zo_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_custkey", "o_totalprice")
        mk, mc = o.agg(F.max("o_orderkey"), F.max("o_custkey")).collect()[0]
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(o.repartition(8))
        conj = [("o_orderkey", "between", (0, mk // 6)),
                ("o_custkey", "between", (0, mc // 6))]
        n_before = len(tab.prune_files(tab.manifest(), conj))
        tab.cluster(["o_orderkey", "o_custkey"], n_files=8)
        n_after = len(tab.prune_files(tab.manifest(), conj))
        out = (tab.read(where=conj)
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").cast("long").alias("sum_key"),
                    F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                    .cast("double").alias("sum_price"))
               .select("n_rows", "sum_key", "sum_price",
                       F.lit(int(n_before)).alias("n_files_unclustered"),
                       F.lit(bool(n_after < n_before))
                       .alias("pruned_after_cluster")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_ZORDER_PRUNE_SQL = """
WITH mx AS (SELECT MAX(o_orderkey) AS mk, MAX(o_custkey) AS mc FROM orders)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       8 AS n_files_unclustered,
       TRUE AS pruned_after_cluster
FROM orders, mx
WHERE o_orderkey BETWEEN 0 AND mx.mk // 6
  AND o_custkey BETWEEN 0 AND mx.mc // 6
"""


def snapshot_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest BLOOM stats under the hash oracle - the pruning case
    [min, max] intervals can never serve: EQUALITY on a STRING column
    (string stats are deliberately never recorded - parquet writers may
    truncate them).  Three ranged appends build per-file bloom bitmaps
    over a high-cardinality md5-prefix column; a provably-absent code
    ('z' is not a hex char) must scan ZERO files, the min-orderkey's
    code must scan exactly its one containing file, and the present-code
    read's row aggregate stays exact (the oracle recomputes the code
    with DuckDB's identical md5).  Both scan counts are deterministic:
    the bitmap is a pure function of the fixed corpus and md5."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="snap_bloom_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice",
            F.substring(F.md5(F.col("o_orderkey").cast("string")),
                        1, 8).alias("code"))
        mk, kmin = o.agg(F.max("o_orderkey"),
                         F.min("o_orderkey")).collect()[0]
        k = F.col("o_orderkey")
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        for lo, hi in [(0, mk // 3), (mk // 3 + 1, 2 * mk // 3),
                       (2 * mk // 3 + 1, mk)]:
            tab.append(o.where(k.between(int(lo), int(hi))).coalesce(1),
                       bloom_cols=["code"], bloom_bits=1 << 18)
        m = tab.manifest()
        n_absent = len(tab.prune_files(m, [("code", "==", "zzzzzzzz")]))
        code1 = _hashlib.md5(str(kmin).encode()).hexdigest()[:8]
        n_present = len(tab.prune_files(m, [("code", "==", code1)]))
        out = (tab.read(where=("code", "==", code1))
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").cast("long").alias("sum_key"),
                    F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                    .cast("double").alias("sum_price"))
               .select("n_rows", "sum_key", "sum_price",
                       F.lit(int(n_absent)).alias("n_files_absent_scan"),
                       F.lit(int(n_present)).alias("n_files_present_scan")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_BLOOM_PRUNE_SQL = """
WITH src AS (
  SELECT o_orderkey, o_totalprice,
         substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS code
  FROM orders),
tgt AS (
  SELECT substring(md5(CAST(MIN(o_orderkey) AS VARCHAR)), 1, 8) AS c
  FROM orders)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price,
       0 AS n_files_absent_scan,
       1 AS n_files_present_scan
FROM src, tgt WHERE src.code = tgt.c
"""


def engine_sql_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot tables by SQL IDENTIFIER (r8, VERDICT r7 #4): a
    SQL-only tool holding an Engine runs ``SELECT ... FROM t [VERSION|
    TIMESTAMP AS OF ...]`` with no format() API - Engine.sql rewrites
    registered snapshot names through the same temp-view path as
    catalog tables (reference: OdpsTableCatalog.scala:91-96 exposes
    tables to third-party SQL through the JVM catalog; this is the
    pure-PySpark equivalent).  Two committed versions; the hash pins the
    VERSION AS OF 2 count, a TIMESTAMP AS OF count at v2's own commit
    instant, and the bare-identifier (current) count + key sum."""
    import os as _os
    import tempfile as _tf

    from aliyun_maxcompute_data_collectors_spark.engine import Engine

    root = _tf.mkdtemp(prefix="engine_snap_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        mk = o.agg(F.max("o_orderkey")).collect()[0][0]
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(o.where(F.col("o_orderkey") <= mk // 2))   # v2
        ts_v2 = tab.manifest()["timestamp_ms"]
        tab.append(o.where(F.col("o_orderkey") > mk // 2))    # v3
        eng = Engine(warehouse=_os.path.join(root, "wh"), spark=spark)
        eng.register_snapshot_table("orders_snap", _os.path.join(root, "t"))
        out = eng.sql(f"""
            SELECT (SELECT COUNT(*) FROM orders_snap VERSION AS OF 2)
                     AS n_v2,
                   (SELECT COUNT(*) FROM orders_snap
                      TIMESTAMP AS OF {ts_v2}) AS n_at_v2_ts,
                   COUNT(*) AS n_cur,
                   CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
            FROM orders_snap
        """)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_ENGINE_SQL_SNAPSHOT_SQL = """
WITH mx AS (SELECT MAX(o_orderkey) AS mk FROM orders)
SELECT (SELECT COUNT(*) FROM orders, mx WHERE o_orderkey <= mk // 2)
         AS n_v2,
       (SELECT COUNT(*) FROM orders, mx WHERE o_orderkey <= mk // 2)
         AS n_at_v2_ts,
       COUNT(*) AS n_cur,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM orders
"""


def snapshot_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ DELETE via deletion vectors (r11: Delta DV /
    Iceberg positional-delete shape): ``delete(..., mor=True)`` records
    matching (file, row_index) positions in a parquet sidecar - ZERO
    data-file IO; every read subtracts them with one broadcast
    anti-join.  Table: two single-file appends (keys %10 0-4 / 5-7);
    the MOR delete hits ``o_orderkey % 10 = 6`` (only file 2 holds
    matches).  Hash-pinned: head aggregate after the delete, the
    pre-delete snapshot via time travel, the CDF delete events, and the
    MECHANICS - ``physical_files`` = 2 (no file was rewritten) and
    ``dv_files`` = 1 (exactly one file carries a vector).  A regression
    to copy-on-write flips physical_files' meaning (file set changes);
    a missed anti-join inflates the head aggregate."""
    root = tempfile.mkdtemp(prefix="snap_mor_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))          # v2
        v_pre = tab.append(b.coalesce(1))  # v3
        pre_files = sorted(tab.manifest()["files"])
        v_mor = tab.delete("o_orderkey % 10 = 6", mor=True)
        m = tab.manifest()
        unchanged = int(sorted(m["files"]) == pre_files)
        n_dv = len(m.get("dvs") or {})

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        ch = tab.changes(v_pre, v_mor)
        out = (_row(tab.read(), "head")
               .unionByName(_row(tab.read(v_pre), "pre"))
               .unionByName(_row(
                   ch.where(F.col("_change_type") == "delete"),
                   "cdf_delete"))
               .withColumn("physical_files_unchanged", F.lit(unchanged))
               .withColumn("dv_files", F.lit(n_dv)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MOR_DELETE_SQL = """
WITH pre AS (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 10 < 8),
     head AS (SELECT * FROM pre WHERE o_orderkey % 10 <> 6),
     d6 AS (SELECT * FROM pre WHERE o_orderkey % 10 = 6)
SELECT 'head' AS step, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       1 AS physical_files_unchanged, 1 AS dv_files
FROM head
UNION ALL
SELECT 'pre', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 1
FROM pre
UNION ALL
SELECT 'cdf_delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 1
FROM d6
"""


def snapshot_mor_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WHEN NOT MATCHED BY SOURCE`` under MERGE-ON-READ (r12,
    VERDICT r11 missing #2): the CDC full-sync shape - unmatched
    target rows resolve to deletion-vector POSITIONS (delete clause)
    or re-emitted images (SET clause) instead of rewriting files.
    Table: two single-file appends (keys %10 0-4 / 5-7).  Source:
    keys %10 in (0,1) with doubled prices (matched updates) plus keys
    %10 = 8 (inserts).  Clauses: matched -> take source price;
    unmatched-by-source %10 = 7 -> DELETE; %10 = 6 -> price zeroed.
    Hash-pinned: the head aggregate, the CDF delete AND insert event
    aggregates (old images at original prices; new images doubled/
    zeroed/inserted), and the MECHANICS - both original files still
    in the manifest (nothing rewritten) and dv sidecars present."""
    root = tempfile.mkdtemp(prefix="snap_morun_")
    try:
        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))          # v2: keys %10 in 0-4
        v_pre = tab.append(b.coalesce(1))  # v3: keys %10 in 5-7
        pre_files = set(tab.manifest()["files"])
        src = (a.where(F.col("o_orderkey") % 10 < 2)
               .withColumn("o_totalprice", F.col("o_totalprice") * 2)
               .unionByName(c))
        v_post = tab.merge(
            src, "t.o_orderkey = s.o_orderkey", mor=True,
            matched=[(None, {"o_totalprice": "s.o_totalprice"})],
            not_matched=(None, "*"),
            not_matched_by_source=[
                ("t.o_orderkey % 10 = 7", "delete"),
                ("t.o_orderkey % 10 = 6",
                 {"o_totalprice": "CAST(0.0 AS DOUBLE)"})])
        m = tab.manifest()
        originals_kept = int(pre_files <= set(m["files"]))
        n_dv = len(m.get("dvs") or {})

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        ch = tab.changes(v_pre, v_post).localCheckpoint(eager=True)
        out = (_row(tab.read(), "head")
               .unionByName(_row(
                   ch.where(F.col("_change_type") == "delete"),
                   "cdf_delete"))
               .unionByName(_row(
                   ch.where(F.col("_change_type") == "insert"),
                   "cdf_insert"))
               .withColumn("originals_kept", F.lit(originals_kept))
               .withColumn("dv_files", F.lit(n_dv)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MOR_UNMATCHED_SQL = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey % 10 < 8),
     head AS (
       SELECT o_orderkey,
              CASE WHEN o_orderkey % 10 < 2 THEN o_totalprice * 2
                   WHEN o_orderkey % 10 = 6 THEN 0.0
                   ELSE o_totalprice END AS o_totalprice
       FROM base WHERE o_orderkey % 10 <> 7
       UNION ALL
       SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey % 10 = 8),
     dels AS (SELECT * FROM base WHERE o_orderkey % 10 IN (0, 1, 6, 7)),
     ins AS (
       SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM base
       WHERE o_orderkey % 10 < 2
       UNION ALL
       SELECT o_orderkey, 0.0 FROM base WHERE o_orderkey % 10 = 6
       UNION ALL
       SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey % 10 = 8)
SELECT 'head' AS step, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       1 AS originals_kept, 2 AS dv_files
FROM head
UNION ALL
SELECT 'cdf_delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 2
FROM dels
UNION ALL
SELECT 'cdf_insert', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 2
FROM ins
"""


def snapshot_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL SYNC via ``mirror()`` (r12): make the table row-for-row
    equal to a source on a key - matched rows update ONLY when values
    differ (null-safe diff clause), new keys insert, keys absent from
    the source delete via WHEN NOT MATCHED BY SOURCE - one commit,
    merge-on-read.  Table: keys %10 0-7.  Truth: keys %10 0-4 with
    prices doubled for %10 < 2, plus keys %10 = 8.  Hash-pinned: the
    head aggregate, the CDF event aggregates (deletes = dropped 5-7 +
    old images of 0-1; inserts = new images + the 8s - rows 2-4 are
    value-identical and must contribute NO events), and the MOR
    mechanics (originals kept, dv sidecars present)."""
    root = tempfile.mkdtemp(prefix="snap_mir_")
    try:
        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))
        v_pre = tab.append(b.coalesce(1))
        pre_files = set(tab.manifest()["files"])
        truth = (a.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 10 < 2,
                   F.col("o_totalprice") * 2)
            .otherwise(F.col("o_totalprice")))
            .unionByName(c))
        v = tab.mirror(truth, ["o_orderkey"], mor=True)
        m = tab.manifest()
        originals_kept = int(pre_files <= set(m["files"]))
        n_dv = len(m.get("dvs") or {})

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        ch = tab.changes(v_pre, v).localCheckpoint(eager=True)
        out = (_row(tab.read(), "head")
               .unionByName(_row(
                   ch.where(F.col("_change_type") == "delete"),
                   "cdf_delete"))
               .unionByName(_row(
                   ch.where(F.col("_change_type") == "insert"),
                   "cdf_insert"))
               .withColumn("originals_kept", F.lit(originals_kept))
               .withColumn("dv_files", F.lit(n_dv)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MIRROR_SQL = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey % 10 < 8),
     truth AS (
       SELECT o_orderkey,
              CASE WHEN o_orderkey % 10 < 2 THEN o_totalprice * 2
                   ELSE o_totalprice END AS o_totalprice
       FROM orders WHERE o_orderkey % 10 < 5
       UNION ALL
       SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey % 10 = 8),
     dels AS (SELECT * FROM base
              WHERE o_orderkey % 10 BETWEEN 5 AND 7
              UNION ALL
              SELECT * FROM base WHERE o_orderkey % 10 < 2),
     ins AS (
       SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM base
       WHERE o_orderkey % 10 < 2
       UNION ALL
       SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey % 10 = 8)
SELECT 'head' AS step, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       1 AS originals_kept, 2 AS dv_files
FROM truth
UNION ALL
SELECT 'cdf_delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 2
FROM dels
UNION ALL
SELECT 'cdf_insert', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 2
FROM ins
"""


def snapshot_dv_heavy_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-HEAVY READ (r12, VERDICT r11 ask #6): what does an
    uncompacted merge-on-read table actually cost to read?  16
    successive MOR deletes on ``lineitem`` accumulate ~16% of the
    table as deletion-vector positions (~1e5 at sf0.1); positions
    fold forward so the read pays ONE sidecar scan + one anti-join.
    Hash-pinned: the DV-applied aggregate, the SAME aggregate after
    ``compact()`` materializes the vectors (equality pins that
    compaction drops nothing), the exact deleted-position total, and
    that compact left zero dv entries.  The bench row prices the
    anti-join read tax + the compaction payoff that SCALE.md's
    dv-read-tax table breaks down.  Four delete commits, not sixteen:
    the per-commit fixed cost is a separately-measured quantity
    (scripts/dv_read_tax.py) and must not drown the read tax this row
    exists to track."""
    root = tempfile.mkdtemp(prefix="snap_dvh_")
    try:
        li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
            "l_orderkey", "l_linenumber", "l_extendedprice")
        tab = SnapshotTable.init(spark, root)
        tab.append(li.coalesce(2))
        for i in range(4):
            tab.delete(f"l_orderkey % 100 BETWEEN {4 * i} AND {4 * i + 3}",
                       mor=True)
        m = tab.manifest()
        n_pos = sum(v["n"] for v in (m.get("dvs") or {}).values())

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("l_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        dv_read = _row(tab.read(), "dv_read").localCheckpoint(eager=True)
        tab.compact()
        n_dv_after = len(tab.manifest().get("dvs") or {})
        out = (dv_read
               .unionByName(_row(tab.read(), "compacted"))
               .withColumn("dv_positions", F.lit(int(n_pos)))
               .withColumn("dv_files_after_compact",
                           F.lit(int(n_dv_after))))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DV_HEAVY_READ_SQL = """
WITH live AS (SELECT l_orderkey, l_extendedprice FROM lineitem
              WHERE l_orderkey % 100 >= 16),
     npos AS (SELECT COUNT(*) AS n FROM lineitem
              WHERE l_orderkey % 100 < 16)
SELECT 'dv_read' AS step, COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS sum_price,
       CAST((SELECT n FROM npos) AS INT) AS dv_positions,
       0 AS dv_files_after_compact
FROM live
UNION ALL
SELECT 'compacted', COUNT(*), CAST(SUM(l_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
            AS DOUBLE),
       CAST((SELECT n FROM npos) AS INT), 0
FROM live
"""


def engine_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-feed TVF by SQL (r11): ``table_changes('t', since[,
    until])`` in ``Engine.sql`` reads a registered snapshot table's
    row-level change feed with per-commit attribution
    (``_change_type`` / ``_commit_version`` / ``_commit_timestamp``) -
    Delta's CDF TVF shape, planned from the r11 per-commit manifest
    deltas at O(changed files).  Table: v2 = append keys %10 in 0-4,
    v3 = append keys %10 in 5-7, v4 = COW UPDATE doubling prices of
    keys %10 = 5 (touches only v3's file).  The hash pins, per
    (commit_version, change_type): row count, key sum, price sum -
    wrong attribution, a missed delete+insert pair, or a whole-file
    (non-row-level) feed all diverge."""
    import os as _os
    import tempfile as _tf

    from aliyun_maxcompute_data_collectors_spark.engine import Engine

    root = _tf.mkdtemp(prefix="engine_tvf_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(a.coalesce(1))   # v2
        tab.append(b.coalesce(1))   # v3
        tab.update({"o_totalprice": "o_totalprice * 2"},
                   "o_orderkey % 10 = 5")  # v4 (COW, touches v3's file)
        eng = Engine(warehouse=_os.path.join(root, "wh"), spark=spark)
        eng.register_snapshot_table("tvf_snap", _os.path.join(root, "t"))
        out = eng.sql("""
            SELECT _commit_version AS commit_version,
                   _change_type AS change_type,
                   COUNT(*) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                        AS DOUBLE) AS sum_price
            FROM table_changes('tvf_snap', 1)
            GROUP BY _commit_version, _change_type
        """)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_ENGINE_TABLE_CHANGES_SQL = """
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 10 < 5),
     b AS (SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 10 BETWEEN 5 AND 7),
     u AS (SELECT o_orderkey, o_totalprice FROM b
           WHERE o_orderkey % 10 = 5)
SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
       COUNT(*) AS n_rows, CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price
FROM a
UNION ALL
SELECT CAST(3 AS BIGINT), 'insert', COUNT(*),
       CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
FROM b
UNION ALL
SELECT CAST(4 AS BIGINT), 'delete', COUNT(*),
       CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
FROM u
UNION ALL
SELECT CAST(4 AS BIGINT), 'insert', COUNT(*),
       CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,6))), 2)
            AS DOUBLE)
FROM u
"""


def snapshot_bloom_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE with bloom REBUILD (r8, VERDICT r7 #7): ``compact()``
    rewrites the small-file backlog, and without ``bloom_cols=`` the
    rewritten files silently lose their point-lookup bitmaps.  Two
    bloomed ranged appends are compacted with the rebuild opted in; the
    hash pins (a) a provably-absent code scanning ZERO files of the
    compacted table, (b) the compacted file count, and (c) the exact row
    aggregate of a present-code read after maintenance.  Blooms ride the
    stats-segment side files past INLINE_STATS_FILES - same machinery,
    covered by the same row."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="snap_bloomc_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice",
            F.substring(F.md5(F.col("o_orderkey").cast("string")),
                        1, 8).alias("code"))
        mk, kmin = o.agg(F.max("o_orderkey"),
                         F.min("o_orderkey")).collect()[0]
        k = F.col("o_orderkey")
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(o.where(k <= mk // 2).coalesce(1),
                   bloom_cols=["code"], bloom_bits=1 << 18)
        tab.append(o.where(k > mk // 2).coalesce(1),
                   bloom_cols=["code"], bloom_bits=1 << 18)
        tab.compact(target_file_bytes=1 << 26, bloom_cols=["code"],
                    bloom_bits=1 << 22)
        mc = tab.manifest()
        n_absent = len(tab.prune_files(mc, [("code", "==", "zzzzzzzz")]))
        n_files = len(mc["files"])
        code1 = _hashlib.md5(str(kmin).encode()).hexdigest()[:8]
        out = (tab.read(where=("code", "==", code1))
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").cast("long").alias("sum_key"))
               .select("n_rows", "sum_key",
                       F.lit(int(n_absent)).alias("n_absent_scan"),
                       F.lit(int(n_files)).alias("n_files_after_compact")))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_BLOOM_COMPACT_SQL = """
WITH tgt AS (
  SELECT substring(md5(CAST(MIN(o_orderkey) AS VARCHAR)), 1, 8) AS c
  FROM orders)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       0 AS n_absent_scan,
       1 AS n_files_after_compact
FROM (SELECT o_orderkey,
             substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS code
      FROM orders) src, tgt
WHERE src.code = tgt.c
"""


def snapshot_filelist_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-LIST segmentation e2e under the oracle (r9, VERDICT r8 #1):
    with ``INLINE_FILES`` pinned low, three single-file appends cross the
    threshold (manifest stores segment references, zero inline paths), a
    fourth append commits O(new files) metadata, ``consolidate_metadata``
    folds the segments with zero data IO, and ``vacuum`` must keep every
    LIVE file segment (the r8 hazard: sweeping them as orphans loses the
    table).  The hash pins the row aggregate after the full lifecycle
    plus the metadata shape: inline path count (0), file-segment count
    after consolidation (1), and surviving version count after vacuum."""
    import json as _json
    import os as _os
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="snap_fseg_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        m = F.col("o_orderkey") % 10
        # per-instance threshold (r10, VERDICT r9 #5): no module-global
        # mutation - safe if registry queries ever run concurrently
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"),
                                 inline_files=2)
        tab.append(o.where(m < 5).coalesce(1))             # v2 (inline)
        tab.append(o.where((m >= 5) & (m < 8)).coalesce(1))  # v3 (inline)
        tab.append(o.where(m == 8).coalesce(1))  # v4: 3 files -> segmented
        tab.append(o.where(m == 9).coalesce(1))  # v5: O(new) delta segment
        tab.consolidate_metadata()                          # v6: one segment
        tab.vacuum(keep_last=2)
        mf = tab.manifest()
        raw = _json.load(open(tab._manifest_path(mf["version"])))
        out = tab.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"),
        ).select(
            "n_rows", "sum_key", "sum_price",
            F.lit(len(raw["files"])).alias("n_inline_paths"),
            F.lit(len(raw.get("file_segments") or []))
            .alias("n_file_segments"),
            F.lit(len(tab.versions())).alias("n_live_versions"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_FILELIST_SEGMENTS_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       0 AS n_inline_paths,
       1 AS n_file_segments,
       2 AS n_live_versions
FROM orders
"""


def pyds_sql_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BARE-SESSION SQL over a snapshot table (r9, VERDICT r8 #7): a tool
    holding only a plain SparkSession - no Engine, no format() API - runs
    ``CREATE TEMPORARY VIEW ... USING graft_snapshot OPTIONS (path,
    version)`` and then plain ``spark.sql`` SELECTs, including a
    time-travel pin and a join between the pinned and current views.
    (Persistent ``CREATE TABLE ... USING`` is unsupported: PySpark 4.1's
    session catalog hands Python data sources an empty options map at
    read time - measured, documented in README.)  Reference parity: the
    JVM catalog route of OdpsTableCatalog.scala:91-96, reached through
    Spark's Python Data Source registry instead."""
    import os as _os
    import tempfile as _tf
    import uuid as _uuid

    from aliyun_maxcompute_data_collectors_spark.session import scoped_sql_conf
    from aliyun_maxcompute_data_collectors_spark.sources.pyds import (
        register_python_datasources,
    )

    register_python_datasources(spark)
    root = _tf.mkdtemp(prefix="pyds_sqlv_")
    tag = _uuid.uuid4().hex[:8]
    v_cur, v_old = f"snapv_cur_{tag}", f"snapv_old_{tag}"
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        k = F.col("o_orderkey")
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(o.where(k % 2 == 0))   # v2
        tab.append(o.where(k % 2 == 1))   # v3
        # the reader implements pushFilters, which PySpark refuses to
        # initialize on a VANILLA session unless the python-filter-
        # pushdown conf is on (engine sessions set it; a bare tool may
        # not) - scope it around the reads and restore, exactly like
        # pyds_snapshot_read
        with scoped_sql_conf(
                spark, "spark.sql.python.filterPushdown.enabled", "true"):
            spark.sql(f"""CREATE TEMPORARY VIEW {v_cur}
                          USING graft_snapshot
                          OPTIONS (path '{_os.path.join(root, "t")}')""")
            spark.sql(f"""CREATE TEMPORARY VIEW {v_old}
                          USING graft_snapshot
                          OPTIONS (path '{_os.path.join(root, "t")}',
                                   version '2')""")
            out = spark.sql(f"""
                SELECT (SELECT COUNT(*) FROM {v_old}) AS n_v2,
                       (SELECT COUNT(*) FROM {v_cur} c
                          LEFT ANTI JOIN {v_old} o
                            ON c.o_orderkey = o.o_orderkey) AS n_added,
                       COUNT(*) AS n_cur,
                       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
                FROM {v_cur}
            """)
            return out.localCheckpoint(eager=True)
    finally:
        for v in (v_cur, v_old):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass
        shutil.rmtree(root, ignore_errors=True)


_PYDS_SQL_VIEW_SQL = """
SELECT (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS n_v2,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 1) AS n_added,
       COUNT(*) AS n_cur,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM orders
"""


def snapshot_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY-ON-WRITE row-level DML under the hash oracle (r9): three
    single-file appends (keys %10: 0-4 / 5-7 / 8), then

    - ``DELETE FROM t WHERE o_orderkey % 10 = 6`` - only the middle
      file holds matches, so exactly 2 of 3 files must carry over
      UNTOUCHED (``carried_delete`` pins the copy-on-write mechanics in
      the hash, not just the row results);
    - ``UPDATE t SET o_totalprice = o_totalprice * 2 WHERE
      o_orderkey % 10 = 8`` - only the third file is rewritten
      (``carried_update``), matched rows get new values, the file's
      other rows (none here) and all other files are byte-carried;
    - the pre-DML version stays readable (time travel = the ``pre``
      row), and ``changes()`` reports the delete's removed rows and the
      update's delete+insert pair exactly (the CDF rows).

    Row-level DML is what the reference's append-only tunnel writers
    structurally lack (OdpsTableCatalog.scala rejects row deletes);
    the snapshot manifest makes it a two-phase O(touched files) op:
    manifest/pushdown scan finds touched files, only those rewrite,
    one atomic commit."""
    root = tempfile.mkdtemp(prefix="snap_dml_")
    try:
        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))          # v2: 1 file, keys %10 in 0-4
        tab.append(b.coalesce(1))          # v3: 1 file, keys %10 in 5-7
        v_pre = tab.append(c.coalesce(1))  # v4: 1 file, keys %10 = 8
        pre_files = set(tab.manifest()["files"])
        v_del = tab.delete("o_orderkey % 10 = 6")
        del_files = set(tab.manifest()["files"])
        carried_d = len(pre_files & del_files)
        v_upd = tab.update({"o_totalprice": "o_totalprice * 2"},
                           "o_orderkey % 10 = 8")
        carried_u = len(del_files & set(tab.manifest()["files"]))

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        ct = F.col("_change_type")
        ch_del = tab.changes(v_pre, v_del).where(ct == "delete")
        ch_upd = tab.changes(v_del, v_upd)
        out = (_row(tab.read(v_pre), "pre")
               .unionByName(_row(tab.read(), "head"))
               .unionByName(_row(ch_del, "cdf_delete"))
               .unionByName(_row(ch_upd.where(ct == "delete"),
                                 "cdf_update_delete"))
               .unionByName(_row(ch_upd.where(ct == "insert"),
                                 "cdf_update_insert"))
               .withColumn("carried_delete", F.lit(carried_d))
               .withColumn("carried_update", F.lit(carried_u)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DELETE_UPDATE_SQL = """
WITH pre AS (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 10 < 9),
     head AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 = 8 THEN o_totalprice * 2
                          ELSE o_totalprice END AS o_totalprice
              FROM pre WHERE o_orderkey % 10 <> 6),
     d6 AS (SELECT * FROM pre WHERE o_orderkey % 10 = 6),
     c8 AS (SELECT * FROM pre WHERE o_orderkey % 10 = 8)
SELECT 'pre' AS step, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       2 AS carried_delete, 2 AS carried_update
FROM pre
UNION ALL
SELECT 'head', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       2, 2
FROM head
UNION ALL
SELECT 'cdf_delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       2, 2
FROM d6
UNION ALL
SELECT 'cdf_update_delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       2, 2
FROM c8
UNION ALL
SELECT 'cdf_update_insert', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,6))), 2)
            AS DOUBLE),
       2, 2
FROM c8
"""


def snapshot_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC predicate-scoped overwrite (Delta replaceWhere shape, r9):
    three single-file appends (keys %10: 0-4 / 5-7 / 8), then ONE commit
    replaces the middle scope with a transformed version of itself
    (prices doubled).  The fully-matched middle file must DROP without a
    rewrite while the other two files carry verbatim (``carried`` pins
    the copy-on-write mechanics), the out-of-scope data is untouched,
    and the pre-replace version stays time-travelable.  This is the
    backfill operation a 100 TB date-partitioned table needs: replace
    one day in one commit, readers never see the gap state."""
    root = tempfile.mkdtemp(prefix="snap_rw_")
    try:
        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))
        tab.append(b.coalesce(1))
        v_pre = tab.append(c.coalesce(1))
        pre_files = set(tab.manifest()["files"])
        fresh = b.withColumn(
            "o_totalprice", (F.col("o_totalprice") * 2)
            .cast(dict(b.dtypes)["o_totalprice"])).coalesce(1)
        tab.replace_where(fresh, "o_orderkey % 10 BETWEEN 5 AND 7")
        carried = len(pre_files & set(tab.manifest()["files"]))

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        out = (_row(tab.read(v_pre), "pre")
               .unionByName(_row(tab.read(), "head"))
               .withColumn("carried", F.lit(carried)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_REPLACE_WHERE_SQL = """
WITH pre AS (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 10 < 9),
     head AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 BETWEEN 5 AND 7
                          THEN o_totalprice * 2 ELSE o_totalprice END
                       AS o_totalprice
              FROM pre)
SELECT 'pre' AS step, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       2 AS carried
FROM pre
UNION ALL
SELECT 'head', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       2
FROM head
"""


def cdc_cow_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-CDC apply as a COPY-ON-WRITE merge, under the hash
    oracle (r9): three single-file appends (keys %10: 0-4 / 5-7 / 8),
    then ONE ops batch - per key %10==5 an out-of-order update pair
    (ts=2 wins), %10==6 a delete, key -1 an insert - applied through
    ``cdc_apply_merge`` (net-effect reduction + COW merge with
    source-key-bound candidate pruning).  Only the middle file holds
    touched keys, so 2 of 3 files must carry verbatim (``carried``);
    the oracle recomputes the net effect with window/CASE SQL."""
    root = tempfile.mkdtemp(prefix="snap_cdcq_")
    try:
        from aliyun_maxcompute_data_collectors_spark.snapshots import cdc_apply_merge

        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))
        tab.append(b.coalesce(1))
        tab.append(c.coalesce(1))
        pre_files = set(tab.manifest()["files"])
        m10 = F.col("o_orderkey") % 10
        k, p = F.col("o_orderkey"), F.col("o_totalprice")
        ops = (
            # two updates per %10==5 key: ts=1 doubles, ts=2 triples -
            # newest (ts=2) must win
            b.where(m10 == 5).select(k, (p * 2).alias("o_totalprice"),
                                     F.lit(1).alias("ts"),
                                     F.lit("U").alias("op"))
            .unionByName(
                b.where(m10 == 5).select(k, (p * 3).alias("o_totalprice"),
                                         F.lit(2).alias("ts"),
                                         F.lit("U").alias("op")))
            .unionByName(
                b.where(m10 == 6).select(k, p.alias("o_totalprice"),
                                         F.lit(1).alias("ts"),
                                         F.lit("D").alias("op")))
            .unionByName(
                spark.range(1).select(
                    F.lit(-1).cast("long").alias("o_orderkey"),
                    F.lit(10.5).cast(dict(b.dtypes)["o_totalprice"])
                    .alias("o_totalprice"),
                    F.lit(1).alias("ts"), F.lit("I").alias("op"))))
        cdc_apply_merge(tab, ops, ["o_orderkey"], ["ts"])
        carried = len(pre_files & set(tab.manifest()["files"]))
        out = (tab.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"))
            .withColumn("carried", F.lit(carried)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_CDC_COW_MERGE_SQL = """
WITH pre AS (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 10 < 9),
     head AS (
       SELECT o_orderkey,
              CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 3
                   ELSE o_totalprice END AS o_totalprice
       FROM pre WHERE o_orderkey % 10 <> 6
       UNION ALL
       SELECT -1, 10.5)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       2 AS carried
FROM head
"""


def pyds_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED streaming under the hash oracle (r10): a
    snapshot table receives two appends, a COW row-level DELETE, and a
    compact; ``readStream ... change_feed=true`` replays the FILE-LEVEL
    changelog from v1 with availableNow - appends as inserts, the
    DELETE as its touched file's (delete pre-image, insert kept rows)
    pair, the compact as NOTHING - into a parquet sink.  The per-
    change-type count/sum aggregate pins the whole contract: a missed
    commit, a mis-classified change type, compaction leaking as
    changes, or double delivery all break the hash."""
    import os as _os

    from aliyun_maxcompute_data_collectors_spark.sources.pyds import (
        register_python_datasources,
    )

    root = tempfile.mkdtemp(prefix="snap_cdf_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(a.coalesce(1))            # v2: insert
        tab.append(b.coalesce(1))            # v3: insert
        tab.delete("o_orderkey % 10 = 6")    # v4: COW pair on b's file
        tab.compact()                        # v5: rows identical - silent
        register_python_datasources(spark)
        out = _os.path.join(root, "out")
        sdf = (spark.readStream.format("graft_snapshot")
               .option("path", tab.path)
               .option("starting_version", "1")
               .option("change_feed", "true").load())
        q = (sdf.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", _os.path.join(root, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        res = (spark.read.parquet(out)
               .groupBy(F.col("_change_type").alias("change_type"))
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").cast("long").alias("sum_key"),
                    F.countDistinct("_commit_version")
                    .cast("int").alias("n_commits")))
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PYDS_CDF_SQL = """
WITH b AS (SELECT o_orderkey FROM orders
           WHERE o_orderkey % 10 BETWEEN 5 AND 7),
     ins AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 5
             UNION ALL SELECT o_orderkey FROM b
             UNION ALL SELECT o_orderkey FROM b WHERE o_orderkey % 10 <> 6)
SELECT 'insert' AS change_type, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key, 3 AS n_commits
FROM ins
UNION ALL
SELECT 'delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT), 1
FROM b
"""


def snapshot_sync_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL REPLICATION under the oracle (r10): a source table
    takes two appends, syncs to a fresh downstream copy (full
    backfill), then a COW row-level DELETE on the source syncs
    incrementally - only the touched keys' destination rows replace
    (``carried`` pins that at least one destination file rode through
    the second sync verbatim), and a no-change re-sync publishes
    nothing (``noop_ok``).  The hash pins the final downstream state
    against the oracle's direct recomputation."""
    import os as _os

    from aliyun_maxcompute_data_collectors_spark.snapshots import sync_changes

    root = tempfile.mkdtemp(prefix="snap_sync_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        src = SnapshotTable.init(spark, _os.path.join(root, "src"))
        dst = SnapshotTable.init(spark, _os.path.join(root, "dst"))
        src.append(a)
        src.append(b)
        sync_changes(src, dst, ["o_orderkey"])          # full backfill
        pre = set(dst.manifest()["files"])
        src.delete("o_orderkey % 10 = 6")               # COW on the source
        sync_changes(src, dst, ["o_orderkey"])          # incremental
        carried = int(bool(pre & set(dst.manifest()["files"])))
        head = dst.current_version()
        noop_ok = int(sync_changes(src, dst, ["o_orderkey"]) == head)
        out = (dst.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"))
            .withColumn("carried", F.lit(carried))
            .withColumn("noop_ok", F.lit(noop_ok)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SYNC_CHANGES_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       1 AS carried,
       1 AS noop_ok
FROM orders
WHERE o_orderkey % 10 < 8 AND o_orderkey % 10 <> 6
"""


def snapshot_parquet_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET manifest segments e2e under the oracle (r10, VERDICT r9
    #6): with per-instance thresholds (``inline_files=2``,
    ``parquet_seg_min_files=1`` - no module-global mutation) four
    single-file appends cross into file-list segmentation with every
    segment written as a PARQUET side file (native-typed stat columns),
    a COW DELETE rides the removal list over the parquet segments, the
    vectorized arrow-kernel prune must keep exactly one file for a
    point predicate, ``consolidate_metadata`` folds parquet->parquet,
    and ``vacuum`` keeps the live segment.  The hash pins the post-DML
    aggregate plus the metadata shape: zero inline paths, ONE parquet
    file segment, one file kept by the prune, two surviving versions."""
    import json as _json
    import os as _os

    root = tempfile.mkdtemp(prefix="snap_pqseg_")
    try:
        o = load_tables(spark, sf_dir, ["orders"])["orders"].select(
            "o_orderkey", "o_totalprice")
        m10 = F.col("o_orderkey") % 10
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"),
                                 inline_files=2, parquet_seg_min_files=1)
        tab.append(o.where(m10 < 5).coalesce(1))
        tab.append(o.where((m10 >= 5) & (m10 < 8)).coalesce(1))
        tab.append(o.where(m10 == 8).coalesce(1))   # crosses: segmented
        tab.append(o.where(m10 == 9).coalesce(1))   # O(new) parquet delta
        tab.delete("o_orderkey % 10 = 6")           # removal list + rewrite
        tab.consolidate_metadata()                  # parquet -> parquet fold
        tab.vacuum(keep_last=2)
        mf = tab.manifest()
        raw = _json.load(open(tab._manifest_path(mf["version"])))
        fsegs = raw.get("file_segments") or []
        n_pruned = len(tab.prune_files(
            mf, [("o_orderkey", "==", int(
                tab.read().agg(F.min("o_orderkey")).collect()[0][0]))]))
        out = tab.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"),
        ).select(
            "n_rows", "sum_key", "sum_price",
            F.lit(len(raw["files"])).alias("n_inline_paths"),
            F.lit(sum(1 for s in fsegs
                      if s.endswith(".parquet"))).alias("n_parquet_segments"),
            F.lit(n_pruned).alias("n_pruned_to"),
            F.lit(len(tab.versions())).alias("n_live_versions"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PARQUET_SEGMENTS_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       0 AS n_inline_paths,
       1 AS n_parquet_segments,
       1 AS n_pruned_to,
       2 AS n_live_versions
FROM orders
WHERE o_orderkey % 10 <> 6
"""


def snapshot_clone_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE + clone-aware vacuum under the oracle (r10, VERDICT
    r9 #7): clone a two-file table (zero copy - the clone's manifest
    references the SOURCE's files), then OVERWRITE the source and vacuum
    it with only ONE version retained.  Without the r10 back-reference
    markers the vacuum would delete the files the clone still
    references; with them the clone must read back its full pinned
    content AFTER the source vacuum.  The hash pins both sides' row
    aggregates plus the marker count and the clone's zero-copy carried
    file count."""
    import os as _os

    root = tempfile.mkdtemp(prefix="snap_clone_")
    try:
        a, b, c = _slices(spark, sf_dir)
        src = SnapshotTable.init(spark, _os.path.join(root, "src"))
        # parallel writes: file counts vary with parallelism, so the
        # zero-copy pin below is the boolean "every clone file IS a
        # source file", not a literal count (keeps the query linear -
        # a coalesce(1) here was the one sf10-superlinear entry, x13)
        src.append(a)
        src.append(b)
        src_files = set(src.manifest()["files"])
        clone = src.clone(_os.path.join(root, "clone"))
        zero_copy = int(set(clone.manifest()["files"]) == src_files)
        src.overwrite(c)
        src.vacuum(keep_last=1)   # clone-protected: shared files survive
        n_markers = len(_os.listdir(_os.path.join(src._root, "clones")))

        def _row(df: DataFrame, step: str) -> DataFrame:
            return (df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
                .cast("double").alias("sum_price"))
                .select(F.lit(step).alias("step"), "n_rows", "sum_key",
                        "sum_price"))

        out = (_row(clone.read(), "clone")
               .unionByName(_row(src.read(), "source"))
               .withColumn("zero_copy", F.lit(zero_copy))
               .withColumn("n_markers", F.lit(n_markers)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_CLONE_VACUUM_SQL = """
SELECT 'clone' AS step, COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       1 AS zero_copy, 1 AS n_markers
FROM orders WHERE o_orderkey % 10 < 8
UNION ALL
SELECT 'source', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE),
       1, 1
FROM orders WHERE o_orderkey % 10 = 8
"""


def snapshot_conflict_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMISTIC-CONCURRENCY retry under the oracle (r10, VERDICT r9
    #4): a COW merge's first attempt collides with a concurrent append
    (interleaved between the merge's read and publish via a write-path
    hook), raising SnapshotConflict with NOTHING published;
    ``retry_on_conflict`` re-runs the merge, which re-reads the NEW HEAD
    and applies the batch exactly once.  The hash pins the final state -
    the interleaved rows AND the merge effect both present, no double
    apply - plus the attempt count (2) and the version count (init + 2
    appends + interleaved append + merge = 5)."""
    import os as _os

    root = tempfile.mkdtemp(prefix="snap_retry_")
    try:
        from aliyun_maxcompute_data_collectors_spark.snapshots import retry_on_conflict

        a, b, c = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, _os.path.join(root, "t"))
        tab.append(a.coalesce(1))
        tab.append(b.coalesce(1))
        ptype = dict(b.dtypes)["o_totalprice"]
        m10 = F.col("o_orderkey") % 10
        src = (b.where(m10 == 5)
               .withColumn("o_totalprice",
                           (F.col("o_totalprice") * 2).cast(ptype))
               .unionByName(spark.range(1).select(
                   F.lit(-1).cast("long").alias("o_orderkey"),
                   F.lit(10.5).cast(ptype).alias("o_totalprice"))))

        orig = tab._write_files
        state = {"fired": 0, "attempts": 0}

        def interleave(df):
            if not state["fired"]:
                state["fired"] = 1
                SnapshotTable(spark, _os.path.join(root, "t")).append(
                    c.coalesce(1))
            return orig(df)

        tab._write_files = interleave

        def op():
            state["attempts"] += 1
            return tab.merge(
                src, "t.o_orderkey = s.o_orderkey",
                matched=[(None, {"o_totalprice": "s.o_totalprice"})],
                not_matched=(None, "*"),
                source_keys=["o_orderkey"])

        retry_on_conflict(op, attempts=4, base_delay_s=0.01)
        out = (tab.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double").alias("sum_price"))
            .withColumn("n_attempts", F.lit(state["attempts"]))
            .withColumn("n_versions", F.lit(len(tab.versions()))))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_CONFLICT_RETRY_SQL = """
WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey % 10 < 9),
     head AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 2
                          ELSE o_totalprice END AS o_totalprice
              FROM base
              UNION ALL
              SELECT -1, 10.5)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_price,
       2 AS n_attempts,
       5 AS n_versions
FROM head
"""


def snapshot_row_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL CDF on a copy-on-write commit at O(touched files)
    (r11, VERDICT r10 missing #1 + next #3/#4): an UPDATE of exactly ONE
    row in a multi-thousand-row file must surface in ``changes()`` as
    exactly 1 delete + 1 insert - not the whole rewritten file - and
    the diff must be computed from the commit's RECORDED file delta
    (manifest ``delta`` field, r11) by scanning only the swapped files,
    never the table.

    Hash-pinned columns: the changed row's key and before/after price,
    the total change-event count (2), and ``touched_only`` = 1 iff the
    CDF scan's input files are a subset of the update commit's
    added+removed files (the O(touched) guarantee itself - a
    regression to whole-table diffing flips it to 0 and fails the
    hash).  Reference analogue: OGG CDC emits exact per-op before/after
    images (ogg-plugin UpdateOperationHandler.java:25-38); here the
    exact row images fall out of diffing one swapped file pair."""
    import os as _os

    root = tempfile.mkdtemp(prefix="snap_rowcdf_")
    try:
        a, b, _ = _slices(spark, sf_dir)
        tab = SnapshotTable.init(spark, root)
        tab.append(a.coalesce(1))          # file 1: keys %10 in 0-4
        v_pre = tab.append(b.coalesce(1))  # file 2: keys %10 in 5-7
        k = b.agg(F.min("o_orderkey")).collect()[0][0]
        v_upd = tab.update({"o_totalprice": "o_totalprice * 3"},
                           ("o_orderkey", "==", int(k)))
        added, removed = tab._commit_delta(v_upd)
        ch = tab.changes(v_pre, v_upd)
        scanned = {_os.path.realpath(f.removeprefix("file:"))
                   for f in ch.inputFiles()}
        allowed = {_os.path.realpath(f) for f in added + removed}
        touched_only = int(bool(scanned) and scanned <= allowed)
        n = ch.count()
        out = (ch.select(
            F.col("_change_type").alias("step"),
            "o_orderkey",
            F.round(F.col("o_totalprice").cast(_DEC), 2)
            .cast("double").alias("price"))
            .withColumn("n_changes", F.lit(n).cast("long"))
            .withColumn("touched_only", F.lit(touched_only)))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_ROW_CDF_SQL = """
WITH t AS (SELECT MIN(o_orderkey) AS k FROM orders
           WHERE o_orderkey % 10 BETWEEN 5 AND 7)
SELECT 'delete' AS step, o.o_orderkey,
       CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)
         AS price,
       CAST(2 AS BIGINT) AS n_changes, 1 AS touched_only
FROM orders o, t WHERE o.o_orderkey = t.k
UNION ALL
SELECT 'insert', o.o_orderkey,
       CAST(ROUND(CAST(o.o_totalprice * 3 AS DECIMAL(18,6)), 2) AS DOUBLE),
       CAST(2 AS BIGINT), 1
FROM orders o, t WHERE o.o_orderkey = t.k
"""


REGISTRY: dict[str, tuple] = {
    "snapshot_row_cdf": (snapshot_row_cdf, _ROW_CDF_SQL),
    "engine_table_changes": (engine_table_changes,
                             _ENGINE_TABLE_CHANGES_SQL),
    "snapshot_mor_delete": (snapshot_mor_delete, _MOR_DELETE_SQL),
    "snapshot_mor_unmatched": (snapshot_mor_unmatched,
                               _MOR_UNMATCHED_SQL),
    "snapshot_dv_heavy_read": (snapshot_dv_heavy_read,
                               _DV_HEAVY_READ_SQL),
    "snapshot_mirror": (snapshot_mirror, _MIRROR_SQL),
    "pyds_cdf_stream": (pyds_cdf_stream, _PYDS_CDF_SQL),
    "snapshot_parquet_segments": (snapshot_parquet_segments,
                                  _PARQUET_SEGMENTS_SQL),
    "snapshot_clone_vacuum": (snapshot_clone_vacuum, _CLONE_VACUUM_SQL),
    "snapshot_sync_changes": (snapshot_sync_changes, _SYNC_CHANGES_SQL),
    "snapshot_conflict_retry": (snapshot_conflict_retry,
                                _CONFLICT_RETRY_SQL),
    "snapshot_delete_update": (snapshot_delete_update, _DELETE_UPDATE_SQL),
    "snapshot_replace_where": (snapshot_replace_where, _REPLACE_WHERE_SQL),
    "cdc_cow_merge": (cdc_cow_merge, _CDC_COW_MERGE_SQL),
    "snapshot_time_travel": (snapshot_time_travel, _TIME_TRAVEL_SQL),
    "snapshot_changes": (snapshot_changes, _CHANGES_SQL),
    "snapshot_compact": (snapshot_compact, _COMPACT_SQL),
    "snapshot_pruned_read": (snapshot_pruned_read, _PRUNED_READ_SQL),
    "snapshot_merge": (snapshot_merge, _MERGE_SQL),
    "pyds_snapshot_read": (pyds_snapshot_read, _PYDS_SNAPSHOT_SQL),
    "pyds_avro_read": (pyds_avro_read, _PYDS_AVRO_SQL),
    "pyds_stream_cycle": (pyds_stream_cycle, _PYDS_STREAM_SQL),
    "mv_refresh": (mv_refresh, _MV_REFRESH_SQL),
    "snapshot_schema_evolution": (snapshot_schema_evolution,
                                  _SCHEMA_EVOLUTION_SQL),
    "snapshot_zorder_prune": (snapshot_zorder_prune, _ZORDER_PRUNE_SQL),
    "snapshot_bloom_prune": (snapshot_bloom_prune, _BLOOM_PRUNE_SQL),
    "snapshot_bloom_compact": (snapshot_bloom_compact, _BLOOM_COMPACT_SQL),
    "engine_sql_snapshot": (engine_sql_snapshot, _ENGINE_SQL_SNAPSHOT_SQL),
    "snapshot_filelist_segments": (snapshot_filelist_segments,
                                   _FILELIST_SEGMENTS_SQL),
    "pyds_sql_view": (pyds_sql_view, _PYDS_SQL_VIEW_SQL),
}
