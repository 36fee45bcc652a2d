"""Plan introspection and write-path guards.

The reference hand-implements pushdown classification and guards
(``OdpsScanBuilder.scala:62-74``, ``ExecutionUtils.scala:18-71``, full-scan
guard ``OdpsScan.scala:163-167``, decimal-scale pushdown guard
``OdpsScan.scala:191-199``).  In Spark the pushdown itself is Catalyst's job;
what this module provides is (a) the *guards* as first-class checks and
(b) plan assertions used by tests/benchmarks to prove that pushdown and
pruning actually happened - the ".explain and iterate" loop, automated.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


class FullScanDisallowed(Exception):
    pass


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) - column pruning proof."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def partition_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pf = pushed_filters(df)
    if not any(column in f for f in pf):
        raise AssertionError(
            f"expected a pushed filter on {column!r}; PushedFilters={pf}\n{formatted_plan(df)}"
        )


def assert_columns_pruned(df: DataFrame, allowed: set[str]) -> None:
    got = set(read_schema_columns(df))
    extra = got - allowed
    if extra:
        raise AssertionError(
            f"scan reads more columns than projected: extra={extra}, allowed={allowed}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = executed_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains a cartesian product:\n{plan}")


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def runtime_bloom_filter_count(df: DataFrame) -> int:
    """Runtime-injected bloom filters (`might_contain` probes) in the plan:
    Spark's InjectRuntimeFilter builds a bloom filter from the selective
    (creation) side of a shuffle join and pushes it into the other side's
    scan - row-group-level semi-join pruning before the shuffle."""
    return executed_plan(df).count("might_contain")


def shuffle_count(df: DataFrame) -> int:
    """Exchanges in the final plan - the number to minimize at 100 TB."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobin)",
                          executed_plan(df)))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees - the spans to widen (SURVEY 'stay
    JVM-side').  AQE reports 0 subtrees on an unexecuted adaptive plan, so the
    probe plan is built with AQE off and the conf restored afterwards."""
    from pyspark.sql import functions as F
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        probe = df.where(F.lit(True))
        s = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            probe._jdf.queryExecution(), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    return int(m.group(1)) if m else 0


# ---------------------------------------------------------------------------
# write/read guards (the reference's validation surface)
# ---------------------------------------------------------------------------

def check_full_scan(
    df: DataFrame,
    partition_columns: list[str],
    allow_full_scan: bool = False,
) -> None:
    """odps.sql.allow.fullscan semantics: a query over a partitioned table
    must carry at least one partition predicate unless full scan is allowed
    (OdpsScan.scala:163-167)."""
    if allow_full_scan or not partition_columns:
        return
    pf = partition_filters(df)
    pushed = pushed_filters(df)
    hit = any(any(c in f for f in pf + pushed) for c in partition_columns)
    if not hit:
        raise FullScanDisallowed(
            f"full scan of partitioned table disallowed; add a predicate on "
            f"one of {partition_columns} or set allow_full_scan=True"
        )


def decimal_pushdown_guard(dtypes: list, max_scale: int = 18) -> bool:
    """The reference disables storage pushdown for the whole scan when any
    decimal has scale > 18 (OdpsScan.scala:191-199; FIXTURES.md section 4).
    Returns False when pushdown must be disabled; Spark's parquet pushdown
    handles wide decimals correctly, so callers use this only for
    bucket-parity layouts."""
    from pyspark.sql.types import DecimalType
    return not any(isinstance(t, DecimalType) and t.scale > max_scale for t in dtypes)
