"""as-of join: window-based distributed implementation vs pandas merge_asof
(the de-facto semantics reference) across directions/strictness/tolerance."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from aliyun_maxcompute_data_collectors_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:01"), 10.0),
            (1, _ts("2024-01-01 00:00:03"), 11.0),
            (1, _ts("2024-01-01 00:00:05"), 12.0),
            (2, _ts("2024-01-01 00:00:02"), 20.0),
            (3, _ts("2024-01-01 00:00:09"), 30.0),  # key with no quotes
        ],
        "sym int, t timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 9.9),
            (1, _ts("2024-01-01 00:00:03"), 10.9),  # equal-ts boundary case
            (1, _ts("2024-01-01 00:00:04"), 11.9),
            (2, _ts("2024-01-01 00:00:04"), 19.9),  # only AFTER the trade
        ],
        "sym int, t timestamp, bid double",
    )
    return trades, quotes


def _pandas_asof(trades, quotes, direction, strict, tol=None):
    lt = trades.toPandas().sort_values("t")
    rt = quotes.toPandas().sort_values("t")
    out = pd.merge_asof(
        lt, rt, on="t", by="sym", direction=direction,
        allow_exact_matches=not strict,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        suffixes=("", "_r"),
    )
    return sorted(
        (int(r.sym), r.t.isoformat(), r.px, None if pd.isna(r.bid) else r.bid)
        for r in out.itertuples()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_pandas(trades_quotes, direction, strict):
    trades, quotes = trades_quotes
    got = asof_join(trades, quotes, on="sym", left_time="t",
                    direction=direction, strict=strict)
    rows = sorted(
        (r["sym"], r["t"].isoformat(), r["px"], r["r_bid"])
        for r in got.collect()
    )
    assert rows == _pandas_asof(trades, quotes, direction, strict)


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    got = asof_join(trades, quotes, on="sym", left_time="t",
                    tolerance_seconds=1)
    rows = {(r["sym"], r["t"].isoformat()): r["r_bid"] for r in got.collect()}
    assert rows == _pandas_asof_tol(trades, quotes)


def _pandas_asof_tol(trades, quotes):
    return {
        (sym, t): bid
        for sym, t, _px, bid in _pandas_asof(trades, quotes, "backward", False, tol=1)
    }


def test_asof_row_count_preserved(trades_quotes):
    trades, quotes = trades_quotes
    assert asof_join(trades, quotes, on="sym", left_time="t").count() == trades.count()


def test_asof_no_cartesian_in_plan(trades_quotes):
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, on="sym", left_time="t")._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # exactly the promised shape: one exchange over the key + one window sort
    assert plan.count("Exchange hashpartitioning") == 1
