"""Relational analytics queries (TPC-H-adapted + event-stream analytics).

The reference has NO SQL/aggregation surface (SURVEY.md §2.4) — these queries
are the extension surface that makes the engine a general analytics engine,
and they double as the bench headline queries.

Determinism convention for oracle hashing: every double-typed SUM goes
through CAST(x AS DECIMAL(18,6)) so Spark and DuckDB aggregate EXACTLY (no
float association error), then the result is cast back to double. Averages
are exact-decimal sums divided in double. Ties in top-k orderings are broken
by a unique key column.

Scale notes per query are in the docstrings — each plan was checked with
.explain("formatted"): filters push into the parquet scan, dimension joins
broadcast, aggregations run partial (map-side) before the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

DEC = "decimal(18,6)"


def _dsum(col):
    return F.sum(F.col(col).cast(DEC)).cast("double")


def _dsum_expr(expr):
    return F.sum(expr.cast(DEC)).cast("double")


# -- q1: pricing summary (TPC-H Q1 shape) -----------------------------------
# One pass over lineitem: pushed-down date filter, 4-way group with partial
# aggregation. At 100 TB this is scan-bound; no join, one shuffle of ~4 rows.

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum_expr(disc_price).alias("sum_disc_price"),
            _dsum_expr(charge).alias("sum_charge"),
            F.round(_dsum("l_quantity") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(_dsum("l_extendedprice") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(_dsum("l_discount") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- q3: shipping priority (TPC-H Q3 shape) ----------------------------------
# customer is small at every SF -> broadcast; orders⋈lineitem is the only
# shuffle join, keyed on orderkey (no skew: orderkeys are uniform).

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum_expr(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# -- q5: revenue by nation (TPC-H Q5 shape, star join) ------------------------
# region/nation/customer/supplier all broadcast; the fact-side shuffle join is
# orders⋈lineitem only. Demonstrates multi-dim star-join planning.

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(_dsum_expr(revenue).alias("revenue"))
        .orderBy("r_name", F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, revenue DESC, n_name
"""


# -- top parts by quantity (join + top-k) -------------------------------------

def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(
            _dsum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("total_qty"), "p_partkey")
        .limit(25)
    )


Q_TOP_PARTS_SQL = """
SELECT p_partkey, p_name, p_brand,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name, p_brand
ORDER BY total_qty DESC, p_partkey
LIMIT 25
"""


# -- window function: top-3 orders per customer -------------------------------

def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


Q_WINDOW_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
  FROM orders
) WHERE rank <= 3
"""


# -- rollup: revenue by region/nation with subtotals ---------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(_dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


Q_ROLLUP_SQL = """
SELECT r_name, n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# -- events: tumbling-window aggregation --------------------------------------
# Batch form of the streaming tumbling window (kinbaku has no streaming at
# all, SURVEY.md §2.4); the streaming twin lives in kinbaku_spark.streaming.

def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


Q_EVENTS_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# -- events: sessionization (gaps-and-islands, 30-min inactivity gap) ----------
# Expressed with window functions so the SAME semantics run in both engines;
# the streaming variant uses session_window (kinbaku_spark.streaming).

SESSION_GAP_US = 1_800_000_000  # 30 min in microseconds — exact integer math


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    sess = ev.withColumn(
        "new_session",
        F.when(gap <= SESSION_GAP_US, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn("session_id", F.sum("new_session").over(wsum))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("sum_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
            _dsum_expr(F.col("sum_value")).alias("total_value"),
        )
        .orderBy("user_id")
    )


Q_EVENTS_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) <= {SESSION_GAP_US}
         THEN 0 ELSE 1 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, value,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       MAX(session_id) AS n_sessions,
       ROUND(AVG(n_events), 6) AS avg_events_per_session,
       CAST(SUM(CAST(sum_value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q_top_parts": q_top_parts,
    "q_window_top_orders": q_window_top_orders,
    "q_rollup_revenue": q_rollup_revenue,
    "q_events_tumbling": q_events_tumbling,
    "q_events_sessions": q_events_sessions,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q_top_parts": Q_TOP_PARTS_SQL,
    "q_window_top_orders": Q_WINDOW_SQL,
    "q_rollup_revenue": Q_ROLLUP_SQL,
    "q_events_tumbling": Q_EVENTS_TUMBLING_SQL,
    "q_events_sessions": Q_EVENTS_SESSIONS_SQL,
}
