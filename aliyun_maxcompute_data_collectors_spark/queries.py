"""Driver-facing query registry: every implemented operator from SURVEY.md
section 2 exposed as a (spark, sf_dir) -> DataFrame callable plus a DuckDB
oracle SQL string.

Numeric determinism convention (so the driver's value-hash matches):
- sums of float/double columns are computed in DECIMAL (exact, associative,
  shuffle-order-independent), then rounded and cast to DOUBLE;
- averages divide the exact decimal sum (as DOUBLE) by the count in double
  arithmetic - identical IEEE ops in both engines;
- raw column passthrough is used freely (no arithmetic -> bit-identical);
- timestamps in outputs are rendered as strings or cast to DATE (Spark
  returns tz-aware values, DuckDB naive - strings sidestep that);
- every ORDER BY carries a unique tiebreak key so LIMIT is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aliyun_maxcompute_data_collectors_spark.session import (
    ensure_parallelism, estimated_scan_bytes, load_tables)

# DECIMAL(18,6) is wide enough for every measure in the test tables while
# leaving sum headroom in both engines.
_DEC = "decimal(18,6)"


def _dec(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_DEC)


def _money(col, scale: int = 2) -> F.Column:
    """Exact decimal -> rounded double (see module docstring)."""
    return F.round(col, scale).cast("double")


def _avg(sum_dec, count_col, scale: int = 4) -> F.Column:
    return F.round(sum_dec.cast("double") / count_col, scale)


# ---------------------------------------------------------------------------
# TPC-H-ish relational core (scan / filter / join / agg surface; SURVEY 2.1-2.5)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-filter-aggregate flagship (columnar scan S1/S6 + pushdown P1-P3):
    filters and the 7-column projection reach the parquet reader."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    # decimal-exact aggregation is CPU-heavy per row; spread a poorly-split
    # scan before the partial aggregate (no-op when the scan is already
    # wide).  input_bytes caps the fan-out by data width: q1 is NOT
    # row-amplifying, and shuffling a narrow scan to 32 tasks costs more in
    # row serialization than the cores recover (the 8-core driver run beat
    # the 32-core one before r13)
    li = ensure_parallelism(
        t["lineitem"].where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02")),
        input_bytes=estimated_scan_bytes(t["lineitem"]),
    )
    # pre-project the decimal casts/products ONCE: aggregate expressions are
    # not common-subexpression-eliminated, so inlining _dec(...) would redo
    # each BigDecimal cast in every aggregate referencing it
    disc_price = F.col("price_d") * (F.lit(1).cast(_DEC) - F.col("disc_d"))
    staged = li.select(
        "l_returnflag", "l_linestatus",
        _dec("l_quantity").alias("qty_d"),
        _dec("l_extendedprice").alias("price_d"),
        _dec("l_discount").alias("disc_d"),
        _dec("l_tax").alias("tax_d"),
    ).select(
        "l_returnflag", "l_linestatus", "qty_d", "price_d", "disc_d",
        disc_price.alias("disc_price_d"),
        (disc_price * (F.lit(1).cast(_DEC) + F.col("tax_d"))).alias("charge_d"),
    )
    return (
        staged.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum("qty_d")).alias("sum_qty"),
            _money(F.sum("price_d")).alias("sum_base_price"),
            _money(F.sum("disc_price_d")).alias("sum_disc_price"),
            _money(F.sum("charge_d")).alias("sum_charge"),
            _avg(F.sum("qty_d"), F.count(F.lit(1))).alias("avg_qty"),
            _avg(F.sum("price_d"), F.count(F.lit(1))).alias("avg_price"),
            _avg(F.sum("disc_d"), F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) * (1 + CAST(l_tax AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-10 (J3 host-engine joins; the
    customer side is broadcast - dims stay under the broadcast threshold)."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(F.col("o_orderdate").cast("date") < F.lit("1998-03-15"))
    li = t["lineitem"].where(F.col("l_shipdate").cast("date") > F.lit("1995-03-15"))
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .agg(_money(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join chain with broadcast dims (region/nation/supplier) -
    the scale path: only orders x lineitem shuffles."""
    t = load_tables(spark, sf_dir, ["region", "nation", "customer", "supplier", "orders", "lineitem"])
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.year("o_orderdate").between(1995, 1997))
        .groupBy("r_name", "n_name")
        .agg(_money(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


_Q5_SQL = """
SELECT r_name, n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 1997
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S5: count(*) without column reads - Spark answers this from parquet
    row-group metadata (the reference's empty-column scan, OdpsScan.scala:237-245)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    return t["lineitem"].agg(F.count(F.lit(1)).alias("cnt"))


def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4: pruned projection + conjunctive pushed filters; raw column
    passthrough (no arithmetic -> bit-exact vs the oracle)."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0)
               & (F.col("o_orderpriority") != "1-URGENT"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_SCAN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0 AND o_orderpriority <> '1-URGENT'
ORDER BY o_orderkey
"""


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO-family: top-k = orderBy + limit; Spark plans TakeOrderedAndProject
    (no global sort materialization at scale)."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


_TOPK_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + exact distinct scan."""
    t = load_tables(spark, sf_dir, ["orders"])
    return t["orders"].agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_DISTINCT_SQL = """
SELECT COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios,
       COUNT(*) AS n_orders
FROM orders
"""


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets surface (SURVEY 2.5 'absent in reference, Spark built-in')."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _money(F.sum(_dec("o_totalprice"))).alias("total"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (SURVEY 2.8)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    building = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = t["customer"].where(F.col("c_acctbal") > 0).select("c_custkey")
    has_orders = t["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct()
    # one plan, no driver-side collects: each set-op count is a 1-row agg,
    # combined by cross join (all three evaluate in a single job)
    u = building.union(rich).distinct().agg(F.count(F.lit(1)).alias("u"))
    i = building.intersect(has_orders).agg(F.count(F.lit(1)).alias("i"))
    e = rich.exceptAll(has_orders).distinct().agg(F.count(F.lit(1)).alias("e"))
    return u.crossJoin(i).crossJoin(e)


_SETOPS_SQL = """
SELECT
 (SELECT COUNT(*) FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 0) t) AS u,
 (SELECT COUNT(*) FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders) t) AS i,
 (SELECT COUNT(*) FROM (
    SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders) t) AS e
"""


# ---------------------------------------------------------------------------
# window functions (SURVEY 2.6) + merge/lookup joins (2.4)
# ---------------------------------------------------------------------------

def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/WF2: cumulative sum per customer (Metabase :window-functions/cumulative)."""
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_custkey", "o_orderkey",
            _money(F.sum(_dec("o_totalprice")).over(w)).alias("cum_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
    )


_CUM_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS cum_spend,
  ROW_NUMBER() OVER w AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: trailing-7-day revenue over per-day aggregates,
    partitioned by year (a global ordered window would funnel one partition;
    per-year partitions bound frame state and parallelize)."""
    t = load_tables(spark, sf_dir, ["orders"])
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_dec("o_totalprice")).alias("rev_d"))
    )
    day_no = F.datediff(F.col("d"), F.lit("1970-01-01"))
    w = Window.partitionBy(F.year("d")).orderBy(day_no).rangeBetween(-6, 0)
    return (
        daily.select(
            F.col("d").cast("string").alias("d"),
            _money(F.col("rev_d")).alias("day_rev"),
            _money(F.sum("rev_d").over(w)).alias("trailing_7d_rev"),
        )
        .orderBy("d")
    )


_RANGE_FRAME_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM orders GROUP BY 1)
SELECT CAST(d AS VARCHAR) AS d,
  CAST(ROUND(rev, 2) AS DOUBLE) AS day_rev,
  CAST(ROUND(SUM(rev) OVER (
      PARTITION BY EXTRACT(year FROM d)
      ORDER BY date_diff('day', DATE '1970-01-01', d)
      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing_7d_rev
FROM daily ORDER BY d
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WF1: lag/lead (Metabase :window-functions/offset). Raw doubles pass
    through untouched -> exact."""
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.lead("o_totalprice", 1).over(w).alias("next_price"),
        )
    )


_LAGLEAD_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
  LAG(o_totalprice, 1) OVER w AS prev_price,
  LEAD(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def merge_newest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: Sqoop MergeJob semantics - newest record per key wins
    (MergeJob.java:53-126) as a window dedup over the events stream table."""
    from aliyun_maxcompute_data_collectors_spark.operators.merge import newest_wins
    t = load_tables(spark, sf_dir, ["events"])
    out = newest_wins(t["events"], keys=["user_id"], order_by=["ts", "event_id"])
    return (
        out.select(
            "user_id", "event_id", "event_type", "value",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


_MERGE_SQL = """
SELECT user_id, event_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: Flink lookup (dimension) join -> broadcast hash join on the dim
    (OdpsLookupFunction.java:42-150)."""
    from aliyun_maxcompute_data_collectors_spark.operators.lookup import lookup_join as lkp
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    joined = lkp(t["customer"], t["nation"], on={"c_nationkey": "n_nationkey"})
    return (
        joined.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             _money(F.sum(_dec("c_acctbal"))).alias("total_acctbal"))
        .orderBy("n_name")
    )


_LOOKUP_SQL = """
SELECT n_name, COUNT(*) AS n_customers,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_acctbal
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4: GoldenGate-style I/U/D apply - final state after replaying the ops
    stream in (ts, id) order; deletes remove the key."""
    from aliyun_maxcompute_data_collectors_spark.streaming.cdc import apply_cdc_batch
    t = load_tables(spark, sf_dir, ["events"])
    ops = t["events"].select(
        F.col("user_id").alias("key"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U").alias("op"),
        F.col("ts").alias("optime"),
        F.col("event_id").alias("opseq"),
        F.col("value"),
    )
    final = apply_cdc_batch(ops, key_cols=["key"], order_cols=["optime", "opseq"],
                            op_col="op", value_cols=["value"])
    return final


_CDC_SQL = """
SELECT key, value FROM (
  SELECT user_id AS key,
         CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
         value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND op <> 'D'
ORDER BY key
"""


# ---------------------------------------------------------------------------
# scalar dialect surface (SURVEY 2.10)
# ---------------------------------------------------------------------------

def date_trunc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datetrunc + datepart families (maxcompute.clj:741-783)."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("month")
    )


_TRUNC_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       COUNT(*) AS cnt
FROM orders
GROUP BY 1, 2, 3
ORDER BY month
"""


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract surface incl. ISO week and day-of-week (Spark: 1=Sunday;
    DuckDB dayofweek is 0=Sunday, offset in the oracle)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .select(
            "event_id",
            F.year("ts").alias("y"),
            F.month("ts").alias("mo"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.minute("ts").alias("mi"),
            F.second("ts").alias("s"),
            F.dayofweek("ts").alias("dow"),
            F.dayofyear("ts").alias("doy"),
            F.weekofyear("ts").alias("wk"),
        )
    )


_PARTS_SQL = """
SELECT event_id,
  EXTRACT(year FROM ts) AS y, EXTRACT(month FROM ts) AS mo,
  EXTRACT(day FROM ts) AS d, EXTRACT(hour FROM ts) AS h,
  EXTRACT(minute FROM ts) AS mi, CAST(EXTRACT(second FROM ts) AS INT) AS s,
  dayofweek(ts) + 1 AS dow, dayofyear(ts) AS doy, weekofyear(ts) AS wk
FROM events ORDER BY event_id
"""


def datetime_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datetime-diff surface (maxcompute.clj:931-958): day diffs order->ship."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    j = t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    lag_days = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.min(lag_days).alias("min_lag"),
            F.max(lag_days).alias("max_lag"),
            F.round(F.sum(lag_days).cast("double") / F.count(F.lit(1)), 4).alias("avg_lag"),
        )
        .orderBy("o_orderpriority")
    )


_DIFF_SQL = """
SELECT o_orderpriority,
  MIN(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS min_lag,
  MAX(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_lag,
  ROUND(CAST(SUM(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE) / COUNT(*), 4) AS avg_lag
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def unix_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestamp_seconds/millis/micros surface (maxcompute.clj:785-789):
    epoch extraction + roundtrip re-render."""
    t = load_tables(spark, sf_dir, ["events"])
    tz = F.col("ts").cast("timestamp")  # NTZ -> session-tz(UTC) instant
    epoch_s = F.floor(F.unix_micros(tz) / 1_000_000).cast("long")
    return (
        t["events"]
        .select(
            "event_id",
            epoch_s.alias("epoch_s"),
            # floor explicitly: Spark's unix_millis ROUNDS sub-ms micros,
            # DuckDB's epoch_ms truncates
            F.floor(F.unix_micros(tz) / 1000).cast("long").alias("epoch_ms"),
            F.date_format(F.timestamp_seconds(epoch_s), "yyyy-MM-dd HH:mm:ss").alias("ts_rt"),
        )
    )


_EPOCH_SQL = """
SELECT event_id,
  CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS epoch_s,
  CAST(epoch_ms(ts) AS BIGINT) AS epoch_ms,
  strftime(make_timestamp(CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS ts_rt
FROM events ORDER BY event_id
"""


def regexp_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regex-match-first (maxcompute.clj:812-814) + P13 regex row parsing."""
    t = load_tables(spark, sf_dir, ["events"])
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1)
    return (
        t["events"]
        .select("event_id", k.alias("k_str"), k.cast("int").alias("k_int"))
        .where(F.col("k_str") != "")
    )


_REGEX_SQL = """
SELECT event_id,
  regexp_extract(props, '"k":\\s*(\\d+)', 1) AS k_str,
  CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k_int
FROM events
WHERE regexp_extract(props, '"k":\\s*(\\d+)', 1) <> ''
ORDER BY event_id
"""


def json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/U4: get_json_object pushable function-call parity."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
    )


_JSON_SQL = """
SELECT event_id, json_extract_string(props, '$.k') AS k
FROM events ORDER BY event_id
"""


def percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: percentile/median SQL-gen surface (maxcompute.clj:816-854)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    q = F.col("l_quantity")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile(q, F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile(q, F.lit(0.5)), 4).alias("median"),
            F.round(F.percentile(q, F.lit(0.75)), 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


_PCT_SQL = """
SELECT l_returnflag,
  ROUND(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 4) AS p25,
  ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS median,
  ROUND(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 4) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: stddev/variance dialect support (maxcompute.clj:81)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.stddev_pop("l_discount"), 4).alias("sdp_disc"),
        )
        .orderBy("l_returnflag")
    )


_STDDEV_SQL = """
SELECT l_returnflag,
  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
  ROUND(var_samp(l_quantity), 4) AS var_qty,
  ROUND(stddev_pop(l_discount), 4) AS sdp_disc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# ingest routing surfaces (W11/W13, ST2)
# ---------------------------------------------------------------------------

def time_partition_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11/ST2: DateTimePartitionAssigner 'dt=yyyy-MM-dd--HH' partition values
    (DateTimePartitionAssigner.java:35-36) applied to event time."""
    from aliyun_maxcompute_data_collectors_spark.streaming.assigner import datetime_partition_value
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(datetime_partition_value(F.col("ts")).alias("dt"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("dt")
    )


_ASSIGN_SQL = """
SELECT strftime(ts, '%Y-%m-%d--%H') AS dt, COUNT(*) AS cnt
FROM events GROUP BY 1 ORDER BY dt
"""


def template_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13: %{col} / %{datetime-pattern} routing templates
    (OdpsUploadProcessor.java:211-233, BucketPath.java:30-35)."""
    from aliyun_maxcompute_data_collectors_spark.functions.templating import render_template
    t = load_tables(spark, sf_dir, ["events"])
    route = render_template("sink/%{event_type}/dt=%{yyyy-MM-dd}", time_col="ts")
    return (
        t["events"]
        .groupBy(route.alias("route"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("route")
    )


_TEMPLATE_SQL = """
SELECT 'sink/' || event_type || '/dt=' || strftime(ts, '%Y-%m-%d') AS route, COUNT(*) AS cnt
FROM events GROUP BY 1 ORDER BY route
"""


def filter_pushdown_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P9 extended predicate surface: IN, IS [NOT] NULL, null-safe =,
    startswith/endswith/contains (FilterType.java:22-38) - all pushed or
    codegen'd by Catalyst."""
    t = load_tables(spark, sf_dir, ["customer"])
    return (
        t["customer"]
        .where(
            F.col("c_mktsegment").startswith("BUIL")
            & F.col("c_name").contains("0")
            & F.col("c_name").endswith("5").__invert__()
            & F.col("c_acctbal").isNotNull()
            & F.col("c_nationkey").isin(0, 5, 10, 15, 20)
            & F.col("c_mktsegment").eqNullSafe(F.lit("BUILDING"))
        )
        .select("c_custkey", "c_name", "c_nationkey")
    )


_FILTER_EXT_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE starts_with(c_mktsegment, 'BUIL')
  AND contains(c_name, '0')
  AND NOT ends_with(c_name, '5')
  AND c_acctbal IS NOT NULL
  AND c_nationkey IN (0, 5, 10, 15, 20)
  AND c_mktsegment IS NOT DISTINCT FROM 'BUILDING'
ORDER BY c_custkey
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (beyond-reference pipeline operator): 30-min
    gap sessions over the events stream table, rolled up per session."""
    from aliyun_maxcompute_data_collectors_spark.operators.relational import session_stats
    t = load_tables(spark, sf_dir, ["events"])
    s = session_stats(t["events"], "user_id", "ts", gap="30 minutes")
    return (
        s.select(
            "user_id", "session_seq",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start_s"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("end_s"),
            "n_events",
        )
    )


_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
  COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority (window rank - one shuffle, no collect)."""
    from aliyun_maxcompute_data_collectors_spark.operators.relational import topk_per_group as tpg
    t = load_tables(spark, sf_dir, ["orders"])
    out = tpg(
        t["orders"].select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return out.orderBy("o_orderpriority", "rank")


_TOPK_GRP_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (2.5 family, Spark built-in)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube) with
    GROUPING() markers distinguishing NULL-as-subtotal from NULL data."""
    t = load_tables(spark, sf_dir, ["orders"])
    t["orders"].createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        ORDER BY g_status, g_prio,
                 o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """)


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
ORDER BY g_status, g_prio,
         o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight range filters + single aggregate; everything
    pushes to the scan."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].where(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.02, 0.08))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _money(F.sum(_dec("l_extendedprice") * _dec("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        t["lineitem"].where(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_money(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + two-level aggregation (how many
    customers have k orders)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"].join(
            t["orders"].where(~F.col("o_orderpriority").startswith("4")),
            F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND NOT starts_with(o_orderpriority, '4')
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q19_discounted_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicates over a join
    (brand x size x quantity bands)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    j = t["lineitem"].join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 40)))
    )
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return j.where(cond).agg(
        _money(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))


_Q19_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between nation pairs (two nation roles
    via aliased broadcast joins)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"])
    n1 = t["nation"].select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    vol = F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money(vol).alias("volume"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS l_year,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS volume,
  COUNT(*) AS n_rows
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year -
    conditional aggregation over a join chain."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "lineitem", "orders",
                                    "customer", "nation", "region"])
    vol = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    n_s = t["nation"].select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation"))
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _money(F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                         .otherwise(F.lit(0).cast(_DEC)))).alias("nation_volume"),
            _money(F.sum(vol)).alias("total_volume"),
        )
        .withColumn("mkt_share",
                    F.round(F.col("nation_volume") / F.col("total_volume"), 6))
        .orderBy("o_year")
    )


_Q8_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
      THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS nation_volume,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS total_volume,
  ROUND(CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
      THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
    / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1 ORDER BY o_year
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share per month — conditional
    aggregation over a broadcast dimension join (part is tiny vs lineitem)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    staged = (
        t["lineitem"]
        .join(F.broadcast(t["part"].select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
            "p_type",
            _dec("l_extendedprice").alias("price_d"),
            _dec("l_discount").alias("disc_d"),
        )
        .select("month", "p_type",
                (F.col("price_d") * (F.lit(1).cast(_DEC) - F.col("disc_d"))).alias("vol_d"))
    )
    return (
        staged.groupBy("month")
        .agg(
            _money(F.sum(F.when(F.col("p_type") == "PROMO", F.col("vol_d"))
                         .otherwise(F.lit(0).cast(_DEC)))).alias("promo_revenue"),
            _money(F.sum("vol_d")).alias("total_revenue"),
        )
        .withColumn("promo_share",
                    F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6))
        .withColumn("month", F.col("month").cast("string"))
        .orderBy("month")
    )


_Q14_SQL = """
SELECT CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR) AS month,
  CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS total_revenue,
  ROUND(100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
    / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE), 6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY month
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the max quarterly revenue.  The
    global max is a 1-row aggregate broadcast back onto the per-supplier
    revenues — no single-partition global window at scale."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    rev = (
        t["lineitem"]
        .where((F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
               & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01")))
        .select("l_suppkey",
                (_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))).alias("vol_d"))
        .groupBy("l_suppkey")
        .agg(F.sum("vol_d").alias("total_rev_d"))
        # tiny (one row per supplier) but referenced twice (probe + max);
        # without materialization both sides re-scan and re-agg lineitem
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total_rev_d").alias("mx_d"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev_d") == F.col("mx_d"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", _money(F.col("total_rev_d")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS total_rev
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders x lineitem join + CASE-conditional counts
    (host-engine join surface, spark-connector README TPC-H parity list).

    The synthetic lineitem has no l_shipmode/l_commitdate/l_receiptdate, so
    l_returnflag stands in for the mode column and l_shipdate for the
    receipt-window predicate; the physical plan is the canonical Q12 one:
    date-filtered lineitem shuffle-joined to orders on the order key, then
    a two-branch conditional aggregate.  COUNT(CASE ...) rather than
    SUM(CASE ...) keeps both engines in BIGINT (DuckDB SUM(int) -> INT128).
    """
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


_Q12_SQL = """
SELECT l_returnflag AS ship_mode,
  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
GROUP BY 1 ORDER BY ship_mode
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — having-filtered aggregate on
    lineitem joined back to orders (both shuffle on the order key, so the
    aggregation's partitioning is reused by the join) + broadcast customer."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer"])
    big = (
        t["lineitem"].select("l_orderkey", _dec("l_quantity").alias("qty_d"))
        .groupBy("l_orderkey")
        .agg(F.sum("qty_d").alias("sum_qty_d"))
        .where(F.col("sum_qty_d") > F.lit(200).cast(_DEC))
    )
    return (
        t["orders"].join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
                "o_totalprice",
                _money(F.col("sum_qty_d"), 0).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
  o_totalprice,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2, 3, 4, 5
HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 200
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no phone column): above-average-balance
    customers with no recent orders, per nation.  Scalar-subquery threshold
    = broadcast 1-row aggregate; NOT EXISTS = left anti join."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cust = t["customer"]
    thr = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = (t["orders"]
              .where(F.col("o_orderdate").cast("date") >= F.lit("2001-06-01"))
              .select("o_custkey"))
    return (
        cust.join(F.broadcast(thr), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             _money(F.sum(_dec("c_acctbal"))).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


_Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '2001-06-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation and year through a part-name filter."""
    t = load_tables(spark, sf_dir, ["part", "supplier", "lineitem", "orders", "nation"])
    profit = F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_name").contains("widget"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_money(profit).alias("profit"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS profit,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey AND contains(p_name, 'widget')
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join - orders with at least one late
    lineitem, counted per priority.  Spark plans a LeftSemi join."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    late = t["lineitem"].select("l_orderkey").distinct()
    o = t["orders"].where(F.year("o_orderdate").between(1996, 1997))
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1996 AND 1997
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti surface: customers with vs without orders."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    keys = t["orders"].select("o_custkey").distinct()
    c = t["customer"]
    semi = (c.join(keys, c.c_custkey == keys.o_custkey, "left_semi")
            .agg(F.count(F.lit(1)).alias("with_orders")))
    anti = (c.join(keys, c.c_custkey == keys.o_custkey, "left_anti")
            .agg(F.count(F.lit(1)).alias("without_orders")))
    return semi.crossJoin(anti)


_SEMI_SQL = """
SELECT
 (SELECT COUNT(*) FROM customer WHERE EXISTS
   (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
 (SELECT COUNT(*) FROM customer WHERE NOT EXISTS
   (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (below 50%% of the per-part
    average quantity) - Catalyst decorrelates to an aggregate + join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"]
    # threshold computed in DOUBLE from the exact decimal sum: decimal
    # division scales differ between engines, IEEE double ops do not
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap"))
        .agg((F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("ap"))
        .where(F.col("l_quantity") < F.col("avg_qty") * 0.5)
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            _money(F.sum(_dec("l_extendedprice"))).alias("total_price"),
        )
    )


_Q17_SQL = """
SELECT COUNT(*) AS n_small,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM lineitem l
JOIN (SELECT l_partkey AS ap,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.ap
WHERE l_quantity < avg_qty * 0.5
"""


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator family - Spark has no built-in): each
    purchase event picks up the user's most recent click at-or-before the
    purchase time.  Single shuffle + window pass (operators/asof.py); the
    oracle is DuckDB's native ASOF LEFT JOIN, so two independent
    implementations must agree row-for-row."""
    from aliyun_maxcompute_data_collectors_spark.operators.asof import asof_join
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"]
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts", "value"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    out = asof_join(purchases, clicks, on="user_id", left_time="ts",
                    right_time="click_ts", right_prefix="")
    return (
        out.select(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value", "click_id",
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_s"),
        )
    )


_ASOF_SQL = """
SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
  p.value,
  c.event_id AS click_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join - custom operator: map each purchase
    event into the 30-min-gap session interval it falls in.  Implemented as a
    bin-tagged equijoin (operators/rangejoin.py), NOT a nested-loop join; the
    oracle expresses the same containment as a plain inequality join."""
    from aliyun_maxcompute_data_collectors_spark.operators.rangejoin import range_join
    from aliyun_maxcompute_data_collectors_spark.operators.relational import session_stats
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"]
    sessions = (
        session_stats(ev, "user_id", "ts", gap="30 minutes")
        .select("user_id", "session_seq", "session_start", "session_end")
    )
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    out = range_join(purchases, sessions, "ts", "session_start", "session_end",
                     keys=["user_id"], bin_seconds=3600)
    return (
        out.select(
            "event_id", "user_id", "session_seq",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start_s"),
        )
    )


_RANGE_JOIN_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
),
intervals AS (
  SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM sess GROUP BY user_id, session_seq
)
SELECT p.event_id, p.user_id, i.session_seq,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
  strftime(i.session_start, '%Y-%m-%d %H:%M:%S') AS start_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN intervals i
  ON p.user_id = i.user_id AND p.ts BETWEEN i.session_start AND i.session_end
ORDER BY p.event_id, i.session_seq
"""


def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: hourly buckets computed
    from raw events, daily buckets RE-aggregated from the hourly level (the
    raw table is scanned once; each coarser level reads the much smaller
    previous one).  The oracle aggregates each level directly from raw -
    proving the cascade is lossless."""
    from aliyun_maxcompute_data_collectors_spark.operators.rangejoin import rollup_cascade
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].select("ts", "event_type", _dec("value").alias("v"))
    out = rollup_cascade(ev, "ts", ["1 hour", "1 day"],
                         group_cols=["event_type"], value_col="v")
    return (
        out.select(
            "resolution",
            F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
            "event_type",
            _money(F.col("sum_v")).alias("sum_value"),
            "n",
            _money(F.col("min_v"), 4).alias("min_value"),
            _money(F.col("max_v"), 4).alias("max_value"),
        )
        .orderBy("resolution", "bucket_s", "event_type")
    )


_ROLLUP_HT_SQL = """
WITH hourly AS (
  SELECT '1 hour' AS resolution, date_trunc('hour', ts) AS b, event_type,
    SUM(CAST(value AS DECIMAL(18,6))) AS sum_v, COUNT(*) AS n,
    MIN(CAST(value AS DECIMAL(18,6))) AS min_v, MAX(CAST(value AS DECIMAL(18,6))) AS max_v
  FROM events GROUP BY 2, 3
),
daily AS (
  SELECT '1 day' AS resolution, date_trunc('day', ts) AS b, event_type,
    SUM(CAST(value AS DECIMAL(18,6))) AS sum_v, COUNT(*) AS n,
    MIN(CAST(value AS DECIMAL(18,6))) AS min_v, MAX(CAST(value AS DECIMAL(18,6))) AS max_v
  FROM events GROUP BY 2, 3
),
unioned AS (SELECT * FROM hourly UNION ALL SELECT * FROM daily)
SELECT resolution, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_s, event_type,
  CAST(ROUND(sum_v, 2) AS DOUBLE) AS sum_value, n,
  CAST(ROUND(min_v, 4) AS DOUBLE) AS min_value,
  CAST(ROUND(max_v, 4) AS DOUBLE) AS max_value
FROM unioned
ORDER BY resolution, bucket_s, event_type
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "late" = shipped >60 days after order date,
    since the test lineitem has no commit/receipt dates): suppliers who were
    the ONLY late supplier in a multi-supplier finalized order.

    The classic formulation is a double-correlated EXISTS / NOT EXISTS
    self-join on lineitem (the oracle keeps that form).  At 100 TB two
    correlated probes over lineitem are two extra shuffles of the fact table,
    so the Spark plan rewrites them as ONE per-order aggregate - count of
    distinct suppliers and distinct late suppliers per order - reused for
    both the EXISTS (n_supp > 1) and the NOT EXISTS (n_late_supp = 1) tests.
    """
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    late = F.col("l_shipdate").cast("date") > F.date_add(F.col("o_orderdate").cast("date"), 60)
    li = (
        t["lineitem"]
        .join(t["orders"].where(F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    # one output row per late lineitem (matching the correlated-subquery
    # formulation, which counts qualifying l1 rows, not distinct suppliers)
    waiting = (
        li.where("is_late")
        .select("l_orderkey", "l_suppkey")
        .join(per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
              "l_orderkey")
    )
    nat = (t["supplier"]
           .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
           .where(F.col("n_name").isin("NATION_3", "NATION_7")))
    return (
        waiting.join(F.broadcast(nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name IN ('NATION_3', 'NATION_7')
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
WHERE CAST(l1.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND CAST(l3.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/numeric coercion surface (maxcompute.clj :591-609 temporal
    matrix + :418-465 result parsing types): cast chains across
    string/int/double/decimal/date/timestamp evaluated identically."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
            F.col("o_totalprice").cast("int").alias("price_int"),
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderkey").cast("double").alias("key_dbl"),
            F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            F.to_date(F.col("o_orderdate").cast("date").cast("string")).cast("string").alias("date_rt"),
            F.lit("123").cast("long").alias("s2l"),
            F.lit("1.5").cast("double").alias("s2d"),
        )
    )


_CAST_SQL = """
SELECT o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
  CAST(trunc(o_totalprice) AS INT) AS price_int, -- Spark cast truncates; DuckDB rounds

  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(o_orderkey AS DOUBLE) AS key_dbl,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
  CAST(CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS DATE) AS VARCHAR) AS date_rt,
  CAST('123' AS BIGINT) AS s2l,
  CAST('1.5' AS DOUBLE) AS s2d
FROM orders ORDER BY o_orderkey
"""


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: case, trim, substring, replace, pad, concat,
    split, length - the everyday dialect functions."""
    t = load_tables(spark, sf_dir, ["customer"])
    n = F.col("c_name")
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.upper(n).alias("up"),
            F.lower(n).alias("lo"),
            F.substring(n, 1, 8).alias("sub"),
            F.regexp_replace(n, "[0-9]", "#").alias("masked"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
            F.concat_ws("-", F.lit("cust"), F.col("c_custkey").cast("string")).alias("tagged"),
            F.length(n).alias("len"),
            F.reverse(n).alias("rev"),
            F.split(n, "#").getItem(0).alias("head"),
        )
    )


_STRFN_SQL = """
SELECT c_custkey,
  upper(c_name) AS up, lower(c_name) AS lo,
  substr(c_name, 1, 8) AS sub,
  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
  concat_ws('-', 'cust', CAST(c_custkey AS VARCHAR)) AS tagged,
  length(c_name) AS len,
  reverse(c_name) AS rev,
  string_split(c_name, '#')[1] AS head
FROM customer ORDER BY c_custkey
"""


def salted_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation; results must equal the plain groupBy
    (the oracle) - proving salting is semantics-preserving."""
    from aliyun_maxcompute_data_collectors_spark.operators.skew import salted_agg
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].withColumn("qty_dec", _dec("l_quantity"))
    out = salted_agg(
        li, ["l_returnflag"],
        {"sum_qty_d": ("qty_dec", "sum"), "n": ("l_orderkey", "count"),
         "max_qty": ("l_quantity", "max")},
        n_salts=8,
    )
    return (
        out.select(
            "l_returnflag", _money(F.col("sum_qty_d")).alias("sum_qty"),
            "n", "max_qty",
        ).orderBy("l_returnflag")
    )


_SALTED_SQL = """
SELECT l_returnflag,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
  COUNT(l_orderkey) AS n, MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# name -> (callable, oracle_sql | None)
def q2_min_cost_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar-MIN subquery), re-expressed over
    lineitem as the supply relation (the test schema has no partsupp):
    cheapest supplier(s) for each selected part.

    Spark-first rewrite: the correlated ``cost = (SELECT MIN(cost) ... WHERE
    same part)`` probe becomes a per-part window MIN applied *after* the
    selective part filter - valid because the subquery correlates on the same
    key the filter prunes on, and scale-safe because the window partitions by
    part key (never a global sort).  Host-engine join delegation: SURVEY 2.4
    J3 (reference executes no joins itself)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    part = t["part"].where(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "ECONOMY")
    )
    supply = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        supply.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "s_acctbal", "cost")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


_Q2_SQL = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal, cost
FROM supply
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_size BETWEEN 10 AND 25 AND p_type = 'ECONOMY'
  AND cost = (SELECT MIN(s2.cost) FROM supply s2 WHERE s2.l_partkey = supply.l_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value restricted to one supplier
    region, keeping parts whose value exceeds a fraction of the global total.

    Spark-first rewrite: the scalar ``(SELECT SUM(...) ...)`` threshold
    subquery is a one-row aggregate broadcast back onto the per-part values
    (same pattern as q15 - never a global window).  The per-part relation is
    localCheckpointed because it feeds both the probe and the total.  The
    threshold is scale-free (value > 1.5x the average part value, so the result
    is non-empty at every SF) and exact: both sides stay DECIMAL and the
    fraction is an integer cross-multiply (v*n_parts*2 > total*3), so no double
    rounding can flip a boundary row in either engine."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_regionkey").isin(0, 1))
        .select("s_suppkey")
    )
    val = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            F.round(_dec("l_extendedprice") * _dec("l_quantity"), 6)
            .cast(_DEC).alias("v"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=True)
    )
    total = val.agg(F.sum("v").alias("total_v"), F.count(F.lit(1)).alias("n_parts"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("v") * F.col("n_parts") * 2 > F.col("total_v") * 3)
        .select("l_partkey", _money(F.col("v")).alias("part_value"))
    )


_Q11_SQL = """
WITH val AS (
  SELECT l_partkey,
         -- the wider cast forces DuckDB's multiply onto int128; at (18,6) x
         -- (18,6) it stays in int64 and overflows on price*quantity
         SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(24,6))
                        * CAST(l_quantity AS DECIMAL(18,6)), 6)
                  AS DECIMAL(18,6))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_regionkey IN (0, 1)
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS part_value
FROM val
WHERE CAST(v AS DECIMAL(30,6)) * (SELECT COUNT(*) FROM val) * 2
      > (SELECT SUM(v) FROM val) * 3
ORDER BY part_value DESC, l_partkey
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute bucket,
    excluding a supplier denylist.

    Spark-first rewrite: ``NOT IN (subquery)`` becomes a broadcast left-anti
    join (safe here: s_suppkey is never null, so NOT IN's three-valued-logic
    trap cannot fire); the part-attribute filter side is broadcast.  The agg
    is a COUNT(DISTINCT) - Spark plans it as a two-phase partial_count over
    an expand, no driver involvement."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    part = t["part"].where(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    excluded = t["supplier"].where(F.col("s_acctbal") < 2000).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of some widget
    part's total 1996 volume (nested IN + correlated half-of-sum threshold).

    Spark-first rewrite: the per-part total is a window SUM over the per-
    (part,supplier) volumes (partitioned by part key - no correlated re-scan
    of lineitem); the part filter is applied *before* the window, which
    preserves per-part totals because the window partitions on the filtered
    key.  The outer ``s_suppkey IN (...)`` is a broadcast left-semi join.
    Quantity sums stay DECIMAL; the half threshold is the exact integer
    compare sq*2 > tq in both engines."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    widget = t["part"].where(F.col("p_name").like("%widget%")).select("p_partkey")
    vol = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
    )
    dominant = (
        vol.withColumn("tq", F.sum("sq").over(Window.partitionBy("l_partkey")))
        .where(F.col("sq") * 2 > F.col("tq"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


_Q20_SQL = """
WITH vol AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey AS t_pk, SUM(sq) AS tq FROM vol GROUP BY l_partkey)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT v.l_suppkey
  FROM vol v
  JOIN tot ON v.l_partkey = tot.t_pk
  JOIN part ON p_partkey = v.l_partkey
  WHERE p_name LIKE '%widget%' AND v.sq * 2 > tot.tq
)
ORDER BY s_suppkey
"""


def merge_into_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO (operators/merge.merge_into): per-customer order
    totals merged onto the customer snapshot - conditional DELETE, UPDATE,
    and INSERT branches in one statement.  A doc_id-shifted slice of the
    source creates unmatched keys so the INSERT branch is exercised.  The
    oracle writes the equivalent FULL OUTER JOIN + CASE form (DuckDB has no
    MERGE).  Balance update is a bare double addition (amt is already the
    rounded-decimal double) - no re-rounding, so both engines add the same
    IEEE doubles."""
    from aliyun_maxcompute_data_collectors_spark.operators.merge import merge_into
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    delta = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(_money(F.sum(_dec("o_totalprice"))).alias("amt"),
             F.count(F.lit(1)).alias("n"))
    )
    src = delta.withColumn(
        "k", F.when(F.col("k") % 97 == 0, F.col("k") + 9000000).otherwise(F.col("k"))
    )
    merged = merge_into(
        t["customer"].select("c_custkey", "c_name", "c_acctbal"),
        src,
        "t.c_custkey = s.k",
        matched=[("s.n % 5 = 0", "delete"),
                 (None, {"c_acctbal": "t.c_acctbal + s.amt"})],
        not_matched=(None, {"c_custkey": "s.k",
                            "c_name": "concat('new_', cast(s.k as string))",
                            "c_acctbal": "s.amt"}),
        # keys are unique by construction (groupBy output); skip the check's
        # extra aggregation in the benched path
        validate_cardinality=False,
    )
    return merged


_MERGE_INTO_SQL = """
WITH delta0 AS (
  SELECT o_custkey AS k,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS amt,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey),
src AS (SELECT CASE WHEN k % 97 = 0 THEN k + 9000000 ELSE k END AS k, amt, n
        FROM delta0),
m AS (
  SELECT c.c_custkey AS ck, c.c_name, c.c_acctbal, s.k AS sk, s.amt, s.n
  FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k)
SELECT
  CASE WHEN ck IS NOT NULL THEN ck ELSE sk END AS c_custkey,
  CASE WHEN ck IS NOT NULL AND sk IS NOT NULL AND n % 5 <> 0 THEN c_name
       WHEN ck IS NOT NULL AND sk IS NULL THEN c_name
       ELSE 'new_' || CAST(sk AS VARCHAR) END AS c_name,
  CASE WHEN ck IS NOT NULL AND sk IS NOT NULL AND n % 5 <> 0 THEN c_acctbal + amt
       WHEN ck IS NOT NULL AND sk IS NULL THEN c_acctbal
       ELSE amt END AS c_acctbal
FROM m
WHERE NOT (ck IS NOT NULL AND sk IS NOT NULL AND n % 5 = 0)
ORDER BY c_custkey
"""


def complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ODPS complex types (SURVEY 1.2: ARRAY/MAP/STRUCT): per-order arrays,
    maps, and structs built and consumed with built-in collection functions
    (array_max/distinct/slice/aggregate-fold, element_at on a map, struct
    field access).  Outputs only SCALARS - the driver's pandas canonicalizer
    cannot sort/hash list-valued cells, so the top-3 slice is flattened to
    three nullable columns (try_element_at mirrors DuckDB's out-of-range
    list index -> NULL).  The double-sum fold runs over the SORTED array so
    both engines add in the same IEEE order.  Map/struct construction has no
    DuckDB value-level mirror, so the oracle derives the same scalars
    arithmetically."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].where(F.col("l_orderkey") % 100 == 1)
    per = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity"))).alias("qtys"),
        F.sort_array(F.collect_set("l_returnflag")).alias("flags"),
    )
    m = F.create_map(F.lit("n"), F.size("qtys").cast("long"),
                     F.lit("o"), F.col("l_orderkey"))
    st = F.struct(F.col("l_orderkey").alias("o"), F.size("qtys").alias("n"))
    return (
        per.select(
            "l_orderkey",
            F.size("qtys").alias("n_items"),
            F.array_max("qtys").alias("max_qty"),
            F.round(F.aggregate("qtys", F.lit(0.0), lambda a, x: a + x), 4)
            .alias("sum_qty"),
            F.size(F.array_distinct("qtys")).alias("n_uniq_qty"),
            F.try_element_at(F.reverse(F.sort_array("qtys")), F.lit(1)).alias("top1_qty"),
            F.try_element_at(F.reverse(F.sort_array("qtys")), F.lit(2)).alias("top2_qty"),
            F.try_element_at(F.reverse(F.sort_array("qtys")), F.lit(3)).alias("top3_qty"),
            F.array_join("flags", ",").alias("flag_set"),
            F.element_at(m, F.lit("n")).alias("map_n"),
            st.getField("n").alias("struct_n"),
        )
    )


_COMPLEX_SQL = """
WITH per AS (
  SELECT l_orderkey,
         list_sort(list(l_quantity)) AS qtys,
         list_sort(list_distinct(list(l_returnflag))) AS flags
  FROM lineitem WHERE l_orderkey % 100 = 1 GROUP BY l_orderkey)
SELECT l_orderkey,
  len(qtys) AS n_items,
  list_max(qtys) AS max_qty,
  ROUND(list_reduce(list_prepend(0.0, qtys), (a, x) -> a + x), 4) AS sum_qty,
  len(list_distinct(qtys)) AS n_uniq_qty,
  list_reverse_sort(qtys)[1] AS top1_qty,
  list_reverse_sort(qtys)[2] AS top2_qty,
  list_reverse_sort(qtys)[3] AS top3_qty,
  array_to_string(flags, ',') AS flag_set,
  len(qtys) AS map_n,
  len(qtys) AS struct_n
FROM per ORDER BY l_orderkey
"""


def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window completeness (dialect WF surface beyond lag/lead/
    cumulative): row_number / rank / dense_rank / ntile / percent_rank /
    cume_dist over one partitioned, uniquely-ordered window.  The unique
    (price desc, orderkey) ordering makes every function deterministic."""
    t = load_tables(spark, sf_dir, ["orders"])
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    ranked = t["orders"].select(
        "o_orderpriority", "o_orderkey", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )
    return ranked.where(F.col("rn") <= 10).orderBy("o_orderpriority", "rn")


_RANK_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER w AS rn,
    RANK() OVER w AS rnk,
    DENSE_RANK() OVER w AS drnk,
    NTILE(4) OVER w AS quartile,
    ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
    ROUND(CUME_DIST() OVER w, 6) AS cum_dist
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC))
WHERE rn <= 10
ORDER BY o_orderpriority, rn
"""


REGISTRY: dict[str, tuple] = {
    "merge_into_apply": (merge_into_apply, _MERGE_INTO_SQL),
    "complex_types": (complex_types, _COMPLEX_SQL),
    "window_rank_suite": (window_rank_suite, _RANK_SQL),
    "q2_min_cost_supply": (q2_min_cost_supply, _Q2_SQL),
    "q11_important_parts": (q11_important_parts, _Q11_SQL),
    "q16_supplier_count": (q16_supplier_count, _Q16_SQL),
    "q20_excess_volume": (q20_excess_volume, _Q20_SQL),
    "q1_pricing_summary": (q1_pricing_summary, _Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, _Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, _Q5_SQL),
    "count_star": (count_star, "SELECT COUNT(*) AS cnt FROM lineitem"),
    "scan_filter_project": (scan_filter_project, _SCAN_SQL),
    "topk_orders": (topk_orders, _TOPK_SQL),
    "distinct_agg": (distinct_agg, _DISTINCT_SQL),
    "rollup_orders": (rollup_orders, _ROLLUP_SQL),
    "set_ops": (set_ops, _SETOPS_SQL),
    "window_cumulative": (window_cumulative, _CUM_SQL),
    "window_lag_lead": (window_lag_lead, _LAGLEAD_SQL),
    "window_range_frame": (window_range_frame, _RANGE_FRAME_SQL),
    "merge_newest_wins": (merge_newest_wins, _MERGE_SQL),
    "lookup_join": (lookup_join, _LOOKUP_SQL),
    "cdc_apply": (cdc_apply, _CDC_SQL),
    "date_trunc_extract": (date_trunc_extract, _TRUNC_SQL),
    "date_parts": (date_parts, _PARTS_SQL),
    "datetime_diff": (datetime_diff, _DIFF_SQL),
    "unix_epoch": (unix_epoch, _EPOCH_SQL),
    "regexp_extract": (regexp_extract_q, _REGEX_SQL),
    "json_get": (json_get, _JSON_SQL),
    "percentile_quantity": (percentile_quantity, _PCT_SQL),
    "stddev_variance": (stddev_variance, _STDDEV_SQL),
    "time_partition_assign": (time_partition_assign, _ASSIGN_SQL),
    "template_routing": (template_routing, _TEMPLATE_SQL),
    "filter_pushdown_ext": (filter_pushdown_ext, _FILTER_EXT_SQL),
    "sessionize_events": (sessionize_events, _SESSION_SQL),
    "topk_per_group": (topk_per_group, _TOPK_GRP_SQL),
    "cube_agg": (cube_agg, _CUBE_SQL),
    "grouping_sets": (grouping_sets_agg, _GROUPING_SETS_SQL),
    "salted_agg": (salted_agg_q, _SALTED_SQL),
    "cast_matrix": (cast_matrix, _CAST_SQL),
    "string_functions": (string_functions, _STRFN_SQL),
    "q4_order_priority": (q4_order_priority, _Q4_SQL),
    "semi_anti_join": (semi_anti_join, _SEMI_SQL),
    "q17_small_quantity": (q17_small_quantity, _Q17_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, _Q6_SQL),
    "q7_nation_volume": (q7_nation_volume, _Q7_SQL),
    "q8_market_share": (q8_market_share, _Q8_SQL),
    "q9_product_profit": (q9_product_profit, _Q9_SQL),
    "q14_promo_revenue": (q14_promo_revenue, _Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, _Q15_SQL),
    "q12_shipmode_priority": (q12_shipmode_priority, _Q12_SQL),
    "q18_large_orders": (q18_large_orders, _Q18_SQL),
    "q21_waiting_supplier": (q21_waiting_supplier, _Q21_SQL),
    "asof_join_events": (asof_join_events, _ASOF_SQL),
    "range_join_sessions": (range_join_sessions, _RANGE_JOIN_SQL),
    "rollup_hypertable": (rollup_hypertable, _ROLLUP_HT_SQL),
    "q22_dormant_customers": (q22_dormant_customers, _Q22_SQL),
    "q10_returned_items": (q10_returned_items, _Q10_SQL),
    "q13_customer_distribution": (q13_customer_distribution, _Q13_SQL),
    "q19_discounted_parts": (q19_discounted_parts, _Q19_SQL),
}


def register_llm_ops():
    """Extend REGISTRY with the training-data-pipeline operators (dedup,
    similarity, text analysis).  Kept in a separate module; imported lazily so
    a failure there never breaks the relational core."""
    from aliyun_maxcompute_data_collectors_spark import queries_llm
    REGISTRY.update(queries_llm.REGISTRY)


def register_ext_ops():
    """Extend REGISTRY with the reshaping / extended-aggregate / profiling
    surface (queries_ext.py), same lazy-import convention as the LLM ops."""
    from aliyun_maxcompute_data_collectors_spark import queries_ext
    REGISTRY.update(queries_ext.REGISTRY)


def register_analytics_ops():
    """Extend REGISTRY with the advanced-analytics surface (SCD2 temporal
    history, smoothing/interpolation, skyline, fuzzy matching, regression,
    outliers), same lazy-import convention."""
    from aliyun_maxcompute_data_collectors_spark import queries_analytics
    REGISTRY.update(queries_analytics.REGISTRY)


def register_snapshot_ops():
    """Extend REGISTRY with the snapshot/transaction-layer queries (time
    travel, CDF changes, compaction - VERDICT r6 ask #1), same lazy-import
    convention."""
    from aliyun_maxcompute_data_collectors_spark import queries_snapshots
    REGISTRY.update(queries_snapshots.REGISTRY)


try:
    register_llm_ops()
except ImportError:
    pass

try:
    register_ext_ops()
except ImportError:
    pass

try:
    register_analytics_ops()
except ImportError:
    pass

try:
    register_snapshot_ops()
except ImportError:
    pass
