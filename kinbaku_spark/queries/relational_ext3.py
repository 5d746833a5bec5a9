"""Third wave of relational plan shapes — completes the TPC-H shape sweep
(Q4/Q7/Q8/Q9/Q11/Q12/Q15/Q20/Q21) adapted to the driver schema. The driver
tables have no partsupp and no l_commitdate/l_receiptdate/l_shipmode
(TESTDATA.md), so: "late" is expressed as l_shipdate lagging o_orderdate,
supply cost as p_retailprice, and stock value as shipped lineitem value.
The reference implements none of this (SURVEY.md §2.4 — no joins, no
aggregation framework); this is the Spark-native extension surface.

Plan shapes each query adds over waves 1-2:

- q4_priority_late_orders: EXISTS with a correlated date comparison
  (condition references BOTH sides) -> non-equi left-semi join
- q7_nation_volume: symmetric two-sided dimension filter (nation pairs in
  either direction), 4-table join, group by derived year
- q8_market_share: conditional-share aggregation (SUM(CASE)/SUM) over a
  6-table star join spanning both dimension arms
- q9_product_profit: profit expression mixing fact and dimension columns,
  LIKE-filtered part dimension, nation x year rollup
- q11_part_value: scalar aggregate threshold (HAVING vs subquery total)
- q12_ship_delay_buckets: derived-bucket grouping + two conditional counts
- q15_top_supplier: argmax via exact-decimal equality against a scalar MAX
- q20_promo_suppliers: two-level nested semi-join (supplier IN (grouped
  HAVING over a LIKE-joined fact))
- q21_waiting_suppliers: the only-late-supplier pattern: TPC-H Q21's
  EXISTS/NOT-EXISTS pair collapsed into ONE aggregation per order
  (COUNT(DISTINCT supplier) vs COUNT(DISTINCT late supplier) + MIN to
  name the unique late one) — no self-joins at all

Determinism: double SUMs go through DECIMAL(18,6) (relational.py
convention); q15's argmax equality stays in decimal (exact) and only the
displayed value is cast to double; q8's share divides two exact-decimal
sums in double (identical IEEE op in both engines); datediff on
midnight-aligned timestamps is integer-exact.

Scale notes: every dimension (part/supplier/customer/nation/region)
broadcasts — the only shuffles are fact-side: q4/q12/q21 shuffle on
l_orderkey, q7/q8/q9 aggregate after broadcast-pruning the fact with the
dimension filters (nation-pair, region+type, name-LIKE), q11/q15/q20
aggregate on l_partkey/l_suppkey. Nothing joins fact-to-fact except
orders⋈lineitem on their shared key. q21's single-aggregation form
replaces the textbook double self-join of lineitem (2 extra fact shuffles)
with one groupBy — the dominant cost is one pass over the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.queries.relational import DEC, _dsum, _dsum_expr
from kinbaku_spark.sources.tables import load_table


# -- q4 shape: EXISTS with correlated date predicate -------------------------

def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed in 1997H1 with at least one lineitem shipped more than
    30 days after the order date, counted by priority (TPC-H Q4 with
    lateness re-expressed as ship lag; no l_commitdate in the schema).

    Plan: pushed-down date filter on orders, then a LEFT SEMI join to
    lineitem whose condition references both sides (l_orderkey equality +
    the correlated date comparison) — the equality keys the shuffle, the
    date predicate evaluates post-match, so this stays a hash join.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- q7 shape: nation-pair trade volume --------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between NATION_1 and NATION_2 (either direction) by
    year (TPC-H Q7 shape). The nation-pair filter prunes both dimension
    arms BEFORE they touch the fact: supplier⋈nation and
    customer⋈nation shrink to two nations each and broadcast, so the only
    shuffle is orders⋈lineitem on l_orderkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    c = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum_expr(volume).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  YEAR(l_shipdate) AS l_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# -- q8 shape: market share (conditional fraction of volume) ------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of ECONOMY-part volume sold into ASIA-region
    customers, by order year (TPC-H Q8 shape). Six-table star: part filter
    prunes the fact first (broadcast semi via inner join), region filter
    prunes the customer arm; the share is a SUM(CASE)/SUM of two
    exact-decimal sums divided in double.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    c = cust.join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"))
    s_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(_dsum_expr(target) / _dsum_expr(volume), 6).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT YEAR(o_orderdate) AS o_year,
  ROUND(
    CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
        AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        AS DOUBLE),
  6) AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY 1
ORDER BY 1
"""


# -- q9 shape: product-type profit by nation x year --------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on parts whose name contains 'gear', by supplier nation and
    order year (TPC-H Q9 with p_retailprice standing in for the missing
    ps_supplycost). Profit mixes fact and dimension columns, so the part
    dimension must join BEFORE the aggregation — it broadcasts; the
    orders join supplies the year.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    gear = part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_dsum_expr(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
      AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# -- q11 shape: scalar-threshold important parts ------------------------------

Q11_FRACTION = 0.001


def q11_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from NATION_3 suppliers exceeds
    Q11_FRACTION of that nation's total shipped value (TPC-H Q11 with
    lineitem value standing in for the missing partsupp stock value).

    Plan: ONE shuffle — the per-part aggregation; the scalar total is the
    same decimal sum re-aggregated from the per-part result (no second
    fact scan) and joins back as a broadcast scalar. Threshold compare
    happens in double on exact-decimal inputs — identical in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n3_supp = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(n3_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("value_d"))
    )
    total = per_part.agg(
        (F.sum("value_d").cast("double") * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_d").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value_d").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS value_d
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_d AS DOUBLE) AS value
FROM per_part
WHERE CAST(value_d AS DOUBLE) >
  (SELECT CAST(SUM(value_d) AS DOUBLE) * {Q11_FRACTION} FROM per_part)
ORDER BY value DESC, l_partkey
"""


# -- q12 shape: delay buckets x priority class -------------------------------

def q12_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 shipments bucketed by ship lag (fast <30d, medium 30-89d,
    slow >=90d) with urgent-vs-other order counts per bucket (TPC-H Q12
    shape: derived grouping + paired conditional counts; no l_shipmode in
    the schema, the lag bucket takes its place). datediff on
    midnight-aligned timestamps is integer-exact in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag >= 90, "slow").when(lag >= 30, "medium").otherwise("fast")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


Q12_SQL = """
SELECT
  CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) >= 90 THEN 'slow'
       WHEN DATE_DIFF('day', o_orderdate, l_shipdate) >= 30 THEN 'medium'
       ELSE 'fast' END AS delay_bucket,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
    AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


# -- q15 shape: top supplier (argmax vs scalar subquery) ----------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with maximum revenue in 1997Q1 (TPC-H Q15 shape). The
    argmax equality stays in DECIMAL — exact in both engines — and only
    the displayed revenue is cast to double. One fact shuffle (groupBy
    l_suppkey); the scalar MAX re-aggregates the grouped result and
    broadcasts back.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).alias("rev_d")
        )
    )
    top = rev.agg(F.max("rev_d").alias("max_rev"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("rev_d") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_d").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_d = (SELECT MAX(rev_d) FROM rev)
ORDER BY s_suppkey
"""


# -- q20 shape: nested semi-join on a grouped HAVING --------------------------

def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 30 units of any 'small'-named part
    during 1997 (TPC-H Q20 shape: supplier IN (grouped-HAVING subquery
    over a LIKE-joined fact); availqty threshold re-expressed over shipped
    quantity — no partsupp in the schema; Q20's nation filter dropped
    because it empties the result below sf0.01).

    Plan: part LIKE-filter broadcasts into the fact, one groupBy on
    (l_suppkey, l_partkey), then DISTINCT suppkeys LEFT SEMI into the
    (broadcastable) supplier dimension.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    small = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    qualifying = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 30
  )
ORDER BY s_suppkey
"""


# -- q21 shape: the only-late-supplier pattern --------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper (>60 days after order
    date) on finalized multi-supplier orders, ranked by how often (TPC-H
    Q21 semantics; lateness from ship lag — no l_receiptdate).

    TPC-H's formulation needs an EXISTS plus a NOT EXISTS — two extra
    self-joins of the fact. Both collapse into ONE aggregation per order:
    COUNT(DISTINCT supplier) >= 2 covers the EXISTS, COUNT(DISTINCT late
    supplier) = 1 covers the NOT EXISTS, and MIN(late supplier) names the
    unique offender. One orderkey shuffle instead of three.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late_supp = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.col("l_suppkey"),
    )
    per_order = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.min(late_supp).alias("late_suppkey"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        per_order.groupBy("late_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("late_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
    COUNT(DISTINCT l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      THEN l_suppkey END) AS n_late,
    MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      THEN l_suppkey END) AS late_suppkey
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = late_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES = {
    "q4_priority_late_orders": q4_priority_late_orders,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_part_value": q11_part_value,
    "q12_ship_delay_buckets": q12_ship_delay_buckets,
    "q15_top_supplier": q15_top_supplier,
    "q20_promo_suppliers": q20_promo_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q4_priority_late_orders": Q4_SQL,
    "q7_nation_volume": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_part_value": Q11_SQL,
    "q12_ship_delay_buckets": Q12_SQL,
    "q15_top_supplier": Q15_SQL,
    "q20_promo_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
