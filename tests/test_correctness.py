"""Driver-mimic correctness harness: run every REGISTRY query on Spark and
its oracle on DuckDB over the same parquet tables, then compare row count,
column names, and order-insensitive values - the same shape of check the
driver applies at sf0.01.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
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
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


ORACLE_CASES = sorted(n for n, (_f, sql) in REGISTRY.items() if sql is not None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = sdf.collect()

    con = _duck(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")

    # order-insensitive, column-name-sorted value compare (driver-style)
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_set = sorted(_key([r[i] for i in s_order]) for r in spark_rows)
    d_set = sorted(_key([r[i] for i in d_order]) for r in duck_rows)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mism, f"{name}: first value mismatches: {mism[:3]}"
