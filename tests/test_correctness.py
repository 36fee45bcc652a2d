"""Driver-mimic correctness harness: run every REGISTRY query on Spark and
its oracle on DuckDB over the same parquet tables, then compare row count,
column names, and order-insensitive values - the same shape of check the
driver applies at sf0.01.

Round 4 (VERDICT r3 "What's wrong" #1 / ask #6): both sides are fetched
through pandas (Spark ``toPandas()``, DuckDB ``.df()``), mirroring the
driver's Arrow canonicalization.  That is what exposes the
HUGEINT-vs-BIGINT class: DuckDB widens ``SUM(integer)`` to HUGEINT which
lands in pandas as float64 ("500.0"), while Spark's BIGINT stays int64
("500") - a value-identical hash mismatch the old ``fetchall()`` path
could never see because Python ints absorbed the difference.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime, time as dtime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # scale_up output: a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    """Canonicalize one pandas-fetched value to a hashable string-safe form.

    int-typed and float-typed values deliberately stringify differently
    (``500`` vs ``500.0``) - that asymmetry IS the driver behavior we
    mirror; do not "fix" it here, fix the oracle SQL instead.
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        v = v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
        v = v.replace(tzinfo=None)
        # DuckDB surfaces DATE as midnight datetime64 through pandas while
        # Spark keeps datetime.date objects; fold true midnight to a date.
        if v.time() == dtime(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if v is pd.NaT:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def _frame_keys(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(range(len(pdf.columns)), key=lambda i: str(pdf.columns[i]).lower())
    rows = list(pdf.itertuples(index=False, name=None))
    return sorted(_key([r[i] for i in cols]) for r in rows)


ORACLE_CASES = sorted(n for n, (_f, sql) in REGISTRY.items() if sql is not None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    spark_cols = [c.lower() for c in spdf.columns]

    con = _duck(sf_dir)
    dpdf = con.execute(sql).df()
    duck_cols = [str(c).lower() for c in dpdf.columns]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spdf) == len(dpdf), (
        f"{name}: row count {len(spdf)} vs {len(dpdf)}")

    s_set = _frame_keys(spdf)
    d_set = _frame_keys(dpdf)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mism, f"{name}: first value mismatches: {mism[:3]}"


def test_pandas_path_catches_hugeint_artifact(spark, sf_dir):
    """Self-check for the round-4 canonicalization change: the pre-fix
    dedup_exact oracle (bare ``SUM(n)``, which DuckDB widens to HUGEINT ->
    pandas float64) must MISMATCH the Spark BIGINT result under the
    pandas/Arrow compare path, reproducing the driver's r3 red row.  The
    fixed oracle (``CAST(SUM(n) AS BIGINT)``) is covered by the main
    parametrized case.
    """
    from aliyun_maxcompute_data_collectors_spark.queries_llm import _DEDUP_EXACT_SQL

    pre_fix_sql = _DEDUP_EXACT_SQL.replace(
        "CAST(SUM(n) AS BIGINT)", "SUM(n)").replace(
        "CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)",
        "SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END)")
    assert pre_fix_sql != _DEDUP_EXACT_SQL  # guard: replacement applied

    fn, _ = REGISTRY["dedup_exact"]
    s_set = _frame_keys(fn(spark, sf_dir).toPandas())
    d_set = _frame_keys(_duck(sf_dir).execute(pre_fix_sql).df())
    assert s_set != d_set, (
        "pandas-path harness failed to reproduce the driver's "
        "HUGEINT-vs-BIGINT hash mismatch on the pre-fix oracle")
