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

Round 5 (VERDICT r4 "What's wrong" #1 / ask #2): the harness now mirrors
the driver's canonicalizer EXACTLY on the two points that let
``higher_order_fns`` ship red:

* Before hashing, each frame is passed through ``_driver_sort`` - a raw
  pandas ``sort_values`` over all columns, the same call the driver makes.
  An unhashable cell (list/dict/ndarray) raises there, and the harness
  treats the raise as a red row instead of tuple-izing it away like the
  old ``_norm`` did.
* Every Spark result schema is asserted scalar-only (no array/map/struct
  top-level columns) - the registry-wide guard VERDICT r4 asked for.

And per ADVICE r4 #3, the midnight-timestamp->date fold is no longer
applied to every datetime: it folds ONLY columns that are declared DATE on
their own side (DuckDB ``description`` type ``Date``; Spark ``DateType``),
i.e. exactly the documented DATE-through-pandas artifact.  A TIMESTAMP
column whose values happen to be midnights now stays a timestamp, so a
DATE-vs-TIMESTAMP type mismatch between query and oracle is a local red.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

from aliyun_maxcompute_data_collectors_spark.queries import REGISTRY

# This module defaults to sf0.01 - THE DRIVER'S SCALE - regardless of the
# sf0.001 default the rest of the suite uses (VERDICT r5 ask #2b: the
# higher_order_fns empty-group divergence only manifests at sf0.01, and
# "plain pytest tests/" is what actually gets run under time pressure, so
# plain pytest must check the driver's scale).  SPARK_GRAFT_TEST_SF_DIR
# still overrides for quick sf0.001 iteration.
SF_CORRECTNESS = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def sf_dir():
    return SF_CORRECTNESS


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_NON_SCALAR_SPARK_TYPES = ("array", "map", "struct")


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


def _driver_sort(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization sorts the RAW pandas frame with
    ``sort_values`` over the (name-sorted) columns before hashing.  List /
    dict / ndarray cells make pandas' hashtable factorization throw
    ``TypeError: unhashable type`` - which the driver records as a red row.
    Mirror that exactly: no pre-stringification, let the raise propagate.
    """
    cols = sorted(pdf.columns, key=lambda c: str(c).lower())
    if not cols or pdf.empty:
        return pdf
    return pdf.sort_values(by=list(cols), kind="mergesort")


def _norm(v, fold_midnight: bool = False):
    """Canonicalize one pandas-fetched value to a hashable string-safe form.

    int-typed and float-typed values deliberately stringify differently
    (``500`` vs ``500.0``) - that asymmetry IS the driver behavior we
    mirror; do not "fix" it here, fix the oracle SQL instead.

    ``fold_midnight`` is set ONLY for columns declared DATE on their own
    side: DuckDB surfaces DATE as midnight datetime64 through pandas, so
    those (and only those) midnights fold back to a date string.
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
        if fold_midnight:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _frame_keys(pdf: pd.DataFrame, date_cols=frozenset()) -> list[tuple[str, ...]]:
    """Driver-faithful frame canonicalization: sort the raw frame the way
    the driver does (throws on unhashable cells), then emit name-ordered,
    row-sorted stringified keys.  ``date_cols`` = lowercased names of
    columns DECLARED as dates on this side (midnight-fold applies there
    only)."""
    pdf = _driver_sort(pdf)
    order = sorted(range(len(pdf.columns)),
                   key=lambda i: str(pdf.columns[i]).lower())
    fold = [str(pdf.columns[i]).lower() in date_cols for i in order]
    rows = list(pdf.itertuples(index=False, name=None))
    return sorted(
        tuple(str(_norm(r[i], fold_midnight=f)) for i, f in zip(order, fold))
        for r in rows
    )


def _spark_date_cols(sdf) -> frozenset:
    return frozenset(
        f.name.lower() for f in sdf.schema.fields
        if f.dataType.typeName() == "date"
    )


def _duck_date_cols(description) -> frozenset:
    return frozenset(
        str(name).lower() for name, type_code, *_ in description
        if str(type_code).lower() == "date"
    )


ORACLE_CASES = sorted(n for n, (_f, sql) in REGISTRY.items() if sql is not None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)

    # Registry-wide scalar-only guard (VERDICT r4 ask #2): the driver's
    # pandas canonicalizer cannot sort/hash array/map/struct cells, so a
    # non-scalar top-level column is a guaranteed driver red row.
    bad = [f"{f.name}:{f.dataType.simpleString()}" for f in sdf.schema.fields
           if f.dataType.typeName() in _NON_SCALAR_SPARK_TYPES]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} - the driver canonicalizer "
        "rejects these; flatten/stringify (array_join/to_json) in both the "
        "query and its oracle")

    spdf = sdf.toPandas()
    spark_cols = [c.lower() for c in spdf.columns]

    con = _duck(sf_dir)
    cur = con.execute(sql)
    duck_dates = _duck_date_cols(cur.description)
    dpdf = cur.df()
    duck_cols = [str(c).lower() for c in dpdf.columns]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spdf) == len(dpdf), (
        f"{name}: row count {len(spdf)} vs {len(dpdf)}")

    s_set = _frame_keys(spdf, _spark_date_cols(sdf))
    d_set = _frame_keys(dpdf, duck_dates)
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


def test_harness_rejects_list_columns(spark, sf_dir):
    """Self-check for the round-5 canonicalization change (same pattern as
    the HUGEINT self-check): the PRE-FIX ``higher_order_fns`` shape - raw
    array columns in the result - must now fail in the local harness the
    way it failed on the driver (``TypeError: unhashable type: 'list'``
    inside ``sort_values``), instead of being tuple-ized to a false green.
    """
    import pyspark.sql.functions as F
    from aliyun_maxcompute_data_collectors_spark.queries import load_tables

    t = load_tables(spark, sf_dir, ["lineitem"])
    pre_fix = (
        t["lineitem"].where(F.col("l_orderkey") % 100 == 42)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_quantity")).alias("qtys"))
        .select("l_orderkey",
                F.transform("qtys", lambda x: x * 2).alias("doubled"))
    )
    # the registry-wide schema guard catches it statically...
    assert any(f.dataType.typeName() == "array" for f in pre_fix.schema.fields)
    # ...and the driver-sort mirror catches it dynamically.
    with pytest.raises(TypeError, match="unhashable"):
        _frame_keys(pre_fix.toPandas())


def test_midnight_fold_is_date_scoped():
    """ADVICE r4 #3 self-check: a TIMESTAMP column whose values are all
    midnights no longer folds to date strings, so DATE-vs-TIMESTAMP type
    mismatches between query and oracle are visible locally."""
    ts = pd.DataFrame({"c": pd.to_datetime(["2020-01-01", "2020-02-01"])})
    as_date = pd.DataFrame({"c": [date(2020, 1, 1), date(2020, 2, 1)]})
    # declared-DATE side folds; declared-TIMESTAMP side does not
    assert _frame_keys(ts, date_cols={"c"}) == _frame_keys(as_date)
    assert _frame_keys(ts) != _frame_keys(as_date)
    assert _frame_keys(ts)[0][0] == "2020-01-01T00:00:00"
