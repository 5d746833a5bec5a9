"""Second-wave analytics queries: JSON, set operations, cube, scalar
string/date functions — rounding out the SQL surface the reference lacks
entirely (SURVEY.md §2.4: no scalar functions, no set ops, no grouping
sets anywhere in its 1,591 lines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinbaku_spark.sources.tables import load_table

DEC = "decimal(18,6)"


# -- JSON extraction over events.props ----------------------------------------

def q_events_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k") / F.count(F.lit(1)), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q_EVENTS_JSON_SQL = """
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
  ROUND(SUM(CAST(props->>'k' AS BIGINT)) * 1.0 / COUNT(*), 6) AS avg_k,
  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# -- set operations ------------------------------------------------------------

def q_intersect_customers(spark, sf_dir):
    """Customers active in both 1995 and 2000 (INTERSECT)."""
    orders = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    a = orders.filter(y == 1995).select("o_custkey")
    b = orders.filter(y == 2000).select("o_custkey")
    return a.intersect(b).withColumnRenamed("o_custkey", "custkey")


Q_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 2000
"""


def q_except_customers(spark, sf_dir):
    """Customers active in 1995 but never in 2000 (EXCEPT)."""
    orders = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    a = orders.filter(y == 1995).select("o_custkey")
    b = orders.filter(y == 2000).select("o_custkey")
    # subtract == EXCEPT (set semantics); exceptAll would only cancel one
    # occurrence per match and let multi-order customers leak through
    return a.subtract(b).withColumnRenamed("o_custkey", "custkey")


Q_EXCEPT_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 2000
"""


# -- cube ------------------------------------------------------------------------

def q_cube_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# -- scalar string functions ------------------------------------------------------

def q_string_funcs(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
    )


Q_STRING_FUNCS_SQL = """
SELECT p_partkey,
  UPPER(p_name) AS name_upper,
  LENGTH(p_name) AS name_len,
  SUBSTRING(p_name, 1, 5) AS name_prefix,
  REPLACE(p_type, ' ', '_') AS type_snake,
  p_brand || ':' || p_type AS brand_type,
  COALESCE(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word
FROM part
"""


# -- scalar date functions ----------------------------------------------------------

def q_date_funcs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday (Spark)
            F.col("o_totalprice"),
        )
        .groupBy("y", "q", "m", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


# DuckDB dayofweek: 0=Sunday — shift to Spark's 1=Sunday convention
Q_DATE_FUNCS_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
       CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INTEGER) AS dow,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1, 2, 3, 4
"""


QUERIES = {
    "q_events_json": q_events_json,
    "q_intersect_customers": q_intersect_customers,
    "q_except_customers": q_except_customers,
    "q_cube_orders": q_cube_orders,
    "q_string_funcs": q_string_funcs,
    "q_date_funcs": q_date_funcs,
}

ORACLES = {
    "q_events_json": Q_EVENTS_JSON_SQL,
    "q_intersect_customers": Q_INTERSECT_SQL,
    "q_except_customers": Q_EXCEPT_SQL,
    "q_cube_orders": Q_CUBE_SQL,
    "q_string_funcs": Q_STRING_FUNCS_SQL,
    "q_date_funcs": Q_DATE_FUNCS_SQL,
}


# -- sliding windows (batch twin of streaming.sliding_event_rates) -------------

def q_events_sliding(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


# Spark aligns sliding windows to the epoch; reproduce with integer µs
# arithmetic (15 min = 9e8 µs), each event contributing to 4 windows.
Q_EVENTS_SLIDING_SQL = """
WITH slid AS (
  SELECT event_type,
    make_timestamp((epoch_us(ts) // 900000000) * 900000000
                   - CAST(k.k AS BIGINT) * 900000000) AS window_start
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM slid
GROUP BY 1, 2, 3
"""


# -- exact percentiles (linear interpolation — verified bit-equal) --------------

def q_percentiles(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.25).alias("p25"),
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("o_orderpriority")
    )


Q_PERCENTILES_SQL = """
SELECT o_orderpriority,
  quantile_cont(o_totalprice, 0.25) AS p25,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.9) AS p90,
  MIN(o_totalprice) AS lo,
  MAX(o_totalprice) AS hi
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- semi / anti joins (EXISTS / NOT EXISTS shapes) ------------------------------

def q_semi_join(spark, sf_dir):
    """Orders having at least one deep-discount line item (left-semi)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    deep = li.filter(F.col("l_discount") > 0.08).select("l_orderkey")
    return (
        orders.join(deep, orders.o_orderkey == deep.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q_SEMI_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_anti_join(spark, sf_dir):
    """Orders with NO deep-discount line item (left-anti / NOT EXISTS)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    deep = li.filter(F.col("l_discount") > 0.08).select("l_orderkey")
    return (
        orders.join(deep, orders.o_orderkey == deep.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q_ANTI_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES.update(
    {
        "q_events_sliding": q_events_sliding,
        "q_percentiles": q_percentiles,
        "q_semi_join": q_semi_join,
        "q_anti_join": q_anti_join,
    }
)
ORACLES.update(
    {
        "q_events_sliding": Q_EVENTS_SLIDING_SQL,
        "q_percentiles": Q_PERCENTILES_SQL,
        "q_semi_join": Q_SEMI_JOIN_SQL,
        "q_anti_join": Q_ANTI_JOIN_SQL,
    }
)


# -- TPC-H Q6 shape: forecast revenue change (pure scan + filter + agg) ---------

def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# -- TPC-H Q10 shape: top customers by returned-item revenue --------------------

def q10_returned_items(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue.cast(DEC)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# -- window frames: running revenue per customer --------------------------------

def q_running_revenue(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_revenue"),
    )


Q_RUNNING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
FROM orders
"""


# -- lag: inter-order gaps per customer ------------------------------------------

def q_order_gaps(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
    return (
        orders.select("o_custkey", gap.alias("gap_days"))
        .filter(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
        .orderBy("o_custkey")
    )


Q_ORDER_GAPS_SQL = """
WITH gaps AS (
  SELECT o_custkey,
    date_diff('day',
              LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS gap_days
  FROM orders
)
SELECT o_custkey,
  COUNT(*) AS n_gaps,
  ROUND(AVG(gap_days), 6) AS avg_gap_days,
  CAST(MAX(gap_days) AS INTEGER) AS max_gap_days
FROM gaps
WHERE gap_days IS NOT NULL
GROUP BY o_custkey
ORDER BY o_custkey
"""


QUERIES.update(
    {
        "q6_forecast_revenue": q6_forecast_revenue,
        "q10_returned_items": q10_returned_items,
        "q_running_revenue": q_running_revenue,
        "q_order_gaps": q_order_gaps,
    }
)
ORACLES.update(
    {
        "q6_forecast_revenue": Q6_SQL,
        "q10_returned_items": Q10_SQL,
        "q_running_revenue": Q_RUNNING_REVENUE_SQL,
        "q_order_gaps": Q_ORDER_GAPS_SQL,
    }
)


# -- TPC-H Q14 shape: promo revenue share (conditional aggregation) --------------

def q14_promo_share(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.sum(revenue).cast("double").alias("total_revenue"),
        )
    )


Q14_SQL = """
SELECT
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
  6) AS promo_revenue_pct,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


QUERIES["q14_promo_share"] = q14_promo_share
ORACLES["q14_promo_share"] = Q14_SQL
