"""Unit tests for operators/profile.py (profiling + constraint checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aliyun_maxcompute_data_collectors_spark.operators.profile import (
    check_constraints,
    profile,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name="ann", age=30, city="x"),
            Row(id=2, name="bob", age=None, city="y"),
            Row(id=3, name="bob", age=200, city=None),
            Row(id=3, name="cyd", age=-5, city="zz"),
            Row(id=None, name="Dee", age=41, city="x"),
        ]
    )


def test_profile_long_format(people):
    rows = {r["col_name"]: r for r in profile(people, ["id", "age", "name"]).collect()}
    assert set(rows) == {"id", "age", "name"}
    assert rows["id"]["n_rows"] == 5
    assert rows["id"]["n_null"] == 1
    assert rows["id"]["n_distinct"] == 3
    assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 3.0
    assert rows["id"]["min_text"] is None
    assert rows["age"]["n_null"] == 1
    assert rows["age"]["min_num"] == -5.0 and rows["age"]["max_num"] == 200.0
    assert rows["name"]["min_num"] is None
    # binary/UTF8 ordering: 'Dee' < 'ann'
    assert rows["name"]["min_text"] == "Dee" and rows["name"]["max_text"] == "cyd"
    assert rows["name"]["n_distinct"] == 4


def test_profile_default_columns_and_approx(people):
    # default = every numeric + string column; approx path returns sane counts
    out = profile(people, approx_distinct=True).collect()
    assert {r["col_name"] for r in out} == {"id", "name", "age", "city"}
    ids = next(r for r in out if r["col_name"] == "id")
    assert 2 <= ids["n_distinct"] <= 4  # HLL estimate of 3


def test_profile_rejects_unknown_and_unsupported(people, spark):
    with pytest.raises(ValueError, match="unknown column"):
        profile(people, ["nope"])
    arr = spark.createDataFrame([Row(a=[1, 2])])
    with pytest.raises(ValueError, match="unsupported dtype"):
        profile(arr, ["a"])


def test_constraints_counts(people, spark):
    ref = spark.createDataFrame([Row(pid=1), Row(pid=2)])
    out = check_constraints(
        people,
        [
            ("a_nn_id", "not_null", "id"),
            ("b_range_age", "range", "age", 0, 120),
            ("c_regex_name", "regex", "name", r"^[a-z]+$"),
            ("d_uniq_id", "unique", ["id"]),
            ("e_fk_id", "foreign_key", ["id"], "ref", ["pid"]),
        ],
        {"ref": ref},
    ).collect()
    got = {r["rule"]: r["violations"] for r in out}
    assert got == {
        "a_nn_id": 1,        # one NULL id
        "b_range_age": 2,    # 200 and -5 (NULL age not a violation)
        "c_regex_name": 1,   # 'Dee' has an uppercase letter
        "d_uniq_id": 1,      # id=3 twice -> 4 non-null rows, 3 distinct
        "e_fk_id": 2,        # both id=3 rows lack a parent; NULL id skipped
    }
    # ordered by rule name
    assert [r["rule"] for r in out] == sorted(got)


def test_constraints_validation_errors(people):
    with pytest.raises(ValueError, match="duplicate rule names"):
        check_constraints(people, [("r", "not_null", "id"), ("r", "not_null", "age")])
    with pytest.raises(ValueError, match="unknown ref"):
        check_constraints(people, [("r", "foreign_key", ["id"], "missing", ["x"])])
    with pytest.raises(ValueError, match="unknown rule kind"):
        check_constraints(people, [("r", "frobnicate", "id")])


def test_profile_and_constraints_empty_input(spark):
    empty = spark.createDataFrame([], "id long, name string")
    rows = {r["col_name"]: r for r in profile(empty).collect()}
    assert rows["id"]["n_rows"] == 0 and rows["id"]["n_null"] == 0
    assert rows["id"]["n_distinct"] == 0 and rows["id"]["min_num"] is None
    out = check_constraints(empty, [
        ("nn", "not_null", "id"),
        ("uq", "unique", ["id"]),
    ])
    assert {r["rule"]: r["violations"] for r in out.collect()} == {"nn": 0, "uq": 0}
