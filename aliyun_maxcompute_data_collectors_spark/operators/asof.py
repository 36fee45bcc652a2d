"""Distributed as-of (temporal) join.

The reference delegates all joins to the host engine (SURVEY 2.4 J3) and
Spark has no built-in as-of join, so this is one of the "custom operator"
compositions: implemented entirely with union + one window pass - NO range
cross-join, NO per-key collect, no Python UDF.

Scale story (the reason for this shape): the naive formulations are
  * left JOIN right ON key AND r.ts <= l.ts -> max() : an exploding
    range join (every probe row pairs with ALL earlier build rows), and
  * applyInPandas per key: Python serialization of both tables plus a
    per-key pandas merge_asof.
This implementation instead unions probe and build rows into one relation
(a map-side op, no shuffle), then does a SINGLE shuffle on the join key and
one ordered window pass carrying the build payload forward with
``last(ignorenulls=True)``.  Cost = one exchange + one sort, identical to a
plain shuffled join of the two tables; state per key is O(1) during the
scan.  Skewed keys behave like any windowed aggregate (AQE cannot split a
window partition, so extremely hot keys should be pre-filtered or bucketed
upstream - same caveat as every ordered-window operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_L, _R, _TS, _P = "__asof_l", "__asof_r", "__asof_ts", "__asof_probe"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the single right row with the greatest
    ``right_time`` <= ``left_time`` (direction='backward'; 'forward' gives
    the smallest >=) among rows sharing the ``on`` keys.  Left rows with no
    match keep NULL right columns (left-outer semantics, like DuckDB
    ``ASOF LEFT JOIN`` and pandas ``merge_asof``).

    ``strict`` excludes equal timestamps; ``tolerance_seconds`` voids
    matches further than the tolerance from the probe time.  Right columns
    are emitted as ``right_prefix + name`` (time column included), so
    collisions with left names are impossible.

    The build side must be unique per (keys, right_time) - violators make
    "the" as-of row ambiguous on any engine; pre-aggregate if needed.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_time = right_time or left_time
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lpay = F.struct(*[F.col(c) for c in left.columns]).alias(_L)
    rcols = [c for c in right.columns if c not in on]
    rpay = F.struct(*[F.col(c) for c in rcols]).alias(_R)
    r_schema = right.select(rpay).schema[_R].dataType.simpleString()
    l_schema = left.select(lpay).schema[_L].dataType.simpleString()

    probe = left.select(
        *on,
        F.col(left_time).cast("timestamp").alias(_TS),
        F.lit(1).alias(_P),
        lpay,
        F.lit(None).cast(r_schema).alias(_R),
    )
    build = right.select(
        *on,
        F.col(right_time).cast("timestamp").alias(_TS),
        F.lit(0).alias(_P),
        F.lit(None).cast(l_schema).alias(_L),
        rpay,
    )
    both = probe.unionByName(build)

    # Ordering encodes the boundary rule: inclusive backward wants the build
    # row visible to an equal-timestamp probe (build first), strict wants it
    # hidden (probe first).  Forward mirrors the scan direction.
    ts_ord = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    p_ord = F.col(_P).desc() if strict else F.col(_P).asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, p_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(_R, F.last(_R, ignorenulls=True).over(w)).where(F.col(_P) == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col(_TS))
            - F.unix_micros(F.col(f"{_R}.{right_time}").cast("timestamp"))
        ) / 1_000_000
        matched = matched.withColumn(
            _R, F.when(gap <= tolerance_seconds, F.col(_R)))

    out_cols = [F.col(f"{_L}.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"{_R}.{c}").alias(f"{right_prefix}{c}") for c in rcols]
    return matched.select(*out_cols)
