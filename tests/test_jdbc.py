"""JDBC split planning + export SQL generation (Sqoop surface S13-S15, W12).
Split math is validated for the loss-proof property: every value in [lo,hi]
falls in exactly one split."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from aliyun_maxcompute_data_collectors_spark.sources.jdbc import (
    CONDITIONS_TOKEN, boolean_splits, build_insert_sql, build_update_sql,
    build_upsert_sql, date_splits, decimal_splits, integer_splits, plan_splits,
    text_splits)


def _covered(preds, probe, col="c"):
    """How many predicates accept the probe value (SQL-evaluated in duckdb)."""
    import duckdb
    con = duckdb.connect()
    n = 0
    for p in preds:
        lit = f"'{probe}'" if isinstance(probe, str) else repr(probe)
        if con.execute(f"SELECT {p.replace(col, lit)}").fetchone()[0]:
            n += 1
    return n


def test_integer_splits_partition_the_range():
    preds = integer_splits("c", 0, 100, 4)
    assert len(preds) == 4
    for v in [0, 1, 24, 25, 26, 50, 75, 99, 100]:
        assert _covered(preds, v) == 1, (v, preds)


def test_integer_splits_small_range_collapses():
    assert len(integer_splits("c", 5, 7, 10)) == 3
    assert integer_splits("c", 5, 5, 10) == ["c >= 5 AND c <= 5"]


def test_float_and_decimal_splits_cover():
    preds = plan_splits("c", 0.0, 1.0, 3, "double").predicates
    for v in [0.0, 0.33, 0.34, 0.5, 0.99, 1.0]:
        assert _covered(preds, v) == 1
    dpre = decimal_splits("c", Decimal("0"), Decimal("10"), 4)
    for v in [0, 2.5, 5, 9.99, 10]:
        assert _covered(dpre, v) == 1


def test_date_splits():
    lo, hi = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31)
    preds = date_splits("c", lo, hi, 3)
    assert len(preds) == 3
    assert "TIMESTAMP '2024-01-01 00:00:00'" in preds[0]
    # boundary containment via duckdb
    import duckdb
    con = duckdb.connect()
    for probe in ["2024-01-01", "2024-01-11", "2024-01-21", "2024-01-31"]:
        hits = sum(
            bool(con.execute("SELECT " + p.replace("c ", f"TIMESTAMP '{probe}' ")).fetchone()[0])
            for p in preds
        )
        assert hits == 1


def test_boolean_splits_cover_nulls():
    t, f = boolean_splits("c")
    assert "TRUE" in t and "IS NULL" in f


def test_text_splits_cover_lexicographic_range():
    preds = text_splits("c", "apple", "zebra", 4)
    assert len(preds) == 4
    for probe in ["apple", "banana", "melon", "quince", "zebra"]:
        assert _covered(preds, probe) == 1, (probe, preds)


def test_plan_splits_dispatch_unknown_type():
    with pytest.raises(ValueError):
        plan_splits("c", 0, 1, 2, "geometry")


def test_export_sql_shapes():
    assert build_insert_sql("t", ["a", "b"]) == "INSERT INTO t (a, b) VALUES (?, ?)"
    assert build_update_sql("t", ["a", "b", "k"], ["k"]) == (
        "UPDATE t SET a = ?, b = ? WHERE k = ?")
    up = build_upsert_sql("t", ["k", "v"], ["k"], dialect="postgres")
    assert "ON CONFLICT (k) DO UPDATE SET v = excluded.v" in up
    assert "ON DUPLICATE KEY UPDATE" in build_upsert_sql("t", ["k", "v"], ["k"], "mysql")
    assert "MERGE INTO" in build_upsert_sql("t", ["k", "v"], ["k"], "oracle")


def test_export_roundtrip_via_duckdb(spark, tmp_path):
    """End-to-end export: DataFrame -> foreachPartition batches -> DuckDB
    table, insert then upsert."""
    import duckdb

    from aliyun_maxcompute_data_collectors_spark.sources.jdbc import export_jdbc
    db = str(tmp_path / "x.db")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE tgt (k INTEGER PRIMARY KEY, v VARCHAR)")
    con.close()

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(1)
    export_jdbc(df, lambda: duckdb.connect(db), "tgt", mode="insert")
    df2 = spark.createDataFrame([(2, "B2"), (3, "c")], "k int, v string").coalesce(1)
    export_jdbc(df2, lambda: duckdb.connect(db), "tgt", mode="upsert",
                keys=["k"], dialect="duckdb")
    con = duckdb.connect(db)
    got = dict(con.execute("SELECT k, v FROM tgt ORDER BY k").fetchall())
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_export_call_mode_shapes_and_roundtrip(spark, tmp_path):
    """Stored-procedure export (JdbcCallExportJob parity): statement shapes
    plus an end-to-end run.  Neither DuckDB nor sqlite supports CREATE
    PROCEDURE, so the roundtrip drives the real export path (mode dispatch,
    column->IN-parameter order, executemany batching, commit cadence)
    through a thin DB-API shim that maps the generated CALL statement to the
    procedure's body - the same contract a real server-side procedure has."""
    import duckdb

    from aliyun_maxcompute_data_collectors_spark.sources.jdbc import (
        build_call_sql, export_jdbc)

    assert build_call_sql("sp_load", 3) == "{call sp_load(?, ?, ?)}"
    assert build_call_sql("sp_load", 2, "postgres") == "CALL sp_load(?, ?)"
    assert build_call_sql("sp_load", 1, "oracle") == "BEGIN sp_load(?); END;"
    with pytest.raises(ValueError):
        build_call_sql("sp", 1, "geometry")

    db = str(tmp_path / "call.db")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE tgt (k INTEGER, v VARCHAR)")
    con.close()

    class _CallCursor:
        def __init__(self, cur):
            self._cur = cur

        def executemany(self, sql, batch):
            # default dialect 'ansi' must emit the standard CALL form - a
            # DB-API connection (this shim's contract) rejects the JDBC
            # escape form '{call ...}'
            assert sql == "CALL sp_load(?, ?)"
            self._cur.executemany("INSERT INTO tgt VALUES (?, ?)", batch)

    class _CallConn:
        def __init__(self, db):
            self._con = duckdb.connect(db)

        def cursor(self):
            return _CallCursor(self._con.cursor())

        def commit(self):
            self._con.commit()

        def close(self):
            self._con.close()

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    export_jdbc(df.coalesce(1), lambda: _CallConn(db), "sp_load",
                mode="call", batch_size=2)
    con = duckdb.connect(db)
    got = dict(con.execute("SELECT k, v FROM tgt ORDER BY k").fetchall())
    assert got == {1: "a", 2: "b", 3: "c"}


def test_query_conditions_token_required(spark):
    from aliyun_maxcompute_data_collectors_spark.sources.jdbc import read_jdbc_parallel
    with pytest.raises(ValueError):
        read_jdbc_parallel(spark, "jdbc:x", query="SELECT 1", split_by="c",
                           bounds=(0, 1), col_type="int")
    assert CONDITIONS_TOKEN == "$CONDITIONS"
