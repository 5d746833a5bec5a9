"""Second wave of relational plan shapes (TPC-H-adapted to the driver's
schema — no partsupp table, so Q2/Q17 are re-expressed over lineitem).

Each query exercises a plan shape the first wave doesn't:

- q2_min_cost_supplier: per-group MIN + join-back (correlated-subquery shape)
- q13_customer_distribution: LEFT OUTER join with join-condition filter,
  two-level aggregation (count histogram)
- q16_supplier_part_counts: COUNT(DISTINCT) with IN-list + <> pushdown
- q17_small_qty_revenue: scalar-per-group avg subquery feeding a fact filter
- q18_large_orders: HAVING on a grouped fact, joined back to dims
- q19_or_predicates: OR-of-ANDs selection across a join (pushdown stress)
- q22_idle_customers: scalar aggregate subquery + anti-join

Determinism: all double SUMs go through DECIMAL(18,6) (see relational.py);
comparisons against derived doubles (0.2*avg, unit-price MIN) are safe
because both engines compute them with the identical IEEE operation
sequence — no rounding before comparison, round once at display time.

Scale notes: part/customer/supplier are dimension-sized -> broadcast; the
only shuffles are the fact-side groupBys keyed on uniform keys
(l_orderkey/l_partkey). Q13's left join shuffles customer⋈orders on
custkey; Q17's avg subquery reuses the same l_partkey shuffle partitioning
as the join that consumes it (one exchange, verified via ReusedExchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.queries.relational import _dsum, _dsum_expr
from kinbaku_spark.sources.tables import load_table


# -- q2 shape: cheapest supplier per part ------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each small part, the supplier(s) with the minimum observed unit
    price (reference has no such op; TPC-H Q2 shape: groupwise-min + join
    back, cf. SURVEY.md §2.4 'Joins').

    Plan: two groupBys over the same l_partkey,l_suppkey shuffle, then the
    min-join; part+supplier broadcast. Double equality in the join is safe:
    both sides are the same MIN over the same division results.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    best = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_price"))
    return (
        unit.join(
            best,
            (unit.l_partkey == best.l_partkey)
            & (unit.unit_price == best.min_price),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(part.filter(F.col("p_size") <= 5)),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("unit_price", 6).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


Q2_SQL = """
WITH unit AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, MIN(unit_price) AS min_price FROM unit GROUP BY 1
)
SELECT p_partkey, p_name, s_suppkey, s_name, ROUND(u.unit_price, 6) AS unit_cost
FROM unit u
JOIN best b ON u.l_partkey = b.l_partkey AND u.unit_price = b.min_price
JOIN part ON p_partkey = u.l_partkey AND p_size <= 5
JOIN supplier ON s_suppkey = u.l_suppkey
ORDER BY p_partkey, s_suppkey
"""


# -- q13 shape: customer order-count distribution -----------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer, keeping zero-order customers
    (LEFT OUTER with a join-side predicate — TPC-H Q13 shape).

    Plan: customer is the small side but must be outer-preserved, so the
    join shuffles on custkey; the second aggregation is ~50 rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- q16 shape: distinct suppliers per part attribute --------------------------

def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT supplier) per (brand, type, size) bucket over an
    IN-list + inequality part filter (TPC-H Q16 shape).

    Plan: the part filter prunes at the broadcast build side; the distinct
    aggregation expands to a two-phase (partial-distinct) hash aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -- q17 shape: below-average-quantity revenue --------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is under 20% of their part's
    average quantity (TPC-H Q17 shape: per-group scalar subquery feeding the
    fact filter), reported per brand.

    Plan: the avg subquery re-scans lineitem with only (l_partkey,
    l_quantity) — column pruning makes the second scan cheap — and both
    sides shuffle on l_partkey once for the join. The 0.2*avg comparison
    happens on raw doubles computed identically in both engines
    (decimal-exact sum ÷ count), never on rounded values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (_dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avg_q, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _dsum("l_extendedprice").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


Q17_SQL = """
WITH avg_q AS (
  SELECT l_partkey AS ap_partkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS small_qty_revenue,
  COUNT(*) AS n_lines
FROM lineitem
JOIN avg_q ON l_partkey = ap_partkey
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < CAST('0.2' AS DOUBLE) * avg_qty
GROUP BY p_brand
ORDER BY p_brand
"""


# -- q18 shape: large-volume orders -------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 200, with customer context
    (TPC-H Q18 shape: grouped HAVING joined back to the dims).

    Plan: one l_orderkey groupBy (uniform key), the surviving ~1% of orders
    then join orders (shuffle on orderkey, AQE-shrunk) and broadcast
    customer. Quantities are integer-valued doubles so the >200 cut is
    exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 200
) ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# -- q19 shape: OR-of-ANDs predicate across a join -----------------------------

def q19_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under three alternative brand/size/quantity regimes
    (TPC-H Q19 shape — the classic OR-of-ANDs pushdown stress).

    Plan: Catalyst factors the common join key and pushes the residual OR
    below the broadcast join; per-brand output keeps the hash stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            _dsum_expr(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


Q19_SQL = """
SELECT p_brand,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
ORDER BY p_brand
"""


# -- q22 shape: wealthy customers with no orders -------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count/balance of customers with above-average balance and
    zero orders (TPC-H Q22 shape: scalar aggregate subquery + anti-join).

    Plan: the scalar avg is a 1-row broadcast cross join; the anti-join
    shuffles customer⋈orders on custkey (orders side pre-projected to the
    key column only). The > comparison uses the identically-computed
    decimal-exact average in both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (_dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            _dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS n_custs,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_or_predicates": q19_or_predicates,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_or_predicates": Q19_SQL,
    "q22_idle_customers": Q22_SQL,
}
