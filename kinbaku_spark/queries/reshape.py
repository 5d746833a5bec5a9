"""Reshape operators: pivot (long->wide) and unpivot/melt (wide->long).

The reference has no tabular surface at all (SURVEY.md §2.4); these round
out the SQL-reshape category. Both are single-shuffle plans:

- pivot with an EXPLICIT value list compiles to one groupBy with a
  conditional-aggregate per pivoted column — no extra distinct() pass to
  discover values (that pass is a full scan at 100 TB; always pin the list).
- unpivot is a generator expression (expand) — zero shuffle on top of the
  feeding aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinbaku_spark.sources.tables import load_table

DEC = "decimal(18,6)"

PIVOT_YEARS = list(range(1995, 2002))


def q_pivot_orders(spark, sf_dir):
    """Order counts by priority x order-year, years pivoted to columns."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.select(
            "o_orderpriority",
            F.concat(F.lit("y"), F.year("o_orderdate")).alias("yr"),
        )
        .groupBy("o_orderpriority")
        .pivot("yr", [f"y{y}" for y in PIVOT_YEARS])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves empty cells null; the oracle's conditional COUNT gives 0
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"y{y}"), F.lit(0)).cast("long").alias(f"y{y}")
            for y in PIVOT_YEARS
        ],
    ).orderBy("o_orderpriority")


def _pivot_sql() -> str:
    cols = ",\n  ".join(
        f"COUNT(CASE WHEN year(o_orderdate) = {y} THEN 1 END) AS y{y}"
        for y in PIVOT_YEARS
    )
    return f"""
SELECT o_orderpriority,
  {cols}
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_unpivot_balances(spark, sf_dir):
    """Per-nation customer vs supplier account balances, melted to
    (nation, side, balance) long form via DataFrame.unpivot."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy("c_nationkey").agg(
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("customer_bal")
    )
    s = supp.groupBy("s_nationkey").agg(
        F.sum(F.col("s_acctbal").cast(DEC)).cast("double").alias("supplier_bal")
    )
    wide = (
        nation.join(c, nation.n_nationkey == c.c_nationkey, "left")
        .join(s, nation.n_nationkey == s.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("customer_bal", F.lit(0.0)).alias("customer_bal"),
            F.coalesce("supplier_bal", F.lit(0.0)).alias("supplier_bal"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["customer_bal", "supplier_bal"], "side", "balance"
    ).orderBy("n_name", "side")


UNPIVOT_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
  FROM customer GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nk,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
  FROM supplier GROUP BY 1
),
wide AS (
  SELECT n_name,
         COALESCE(c.bal, CAST(0 AS DOUBLE)) AS customer_bal,
         COALESCE(s.bal, CAST(0 AS DOUBLE)) AS supplier_bal
  FROM nation n
  LEFT JOIN c ON c.nk = n.n_nationkey
  LEFT JOIN s ON s.nk = n.n_nationkey
)
SELECT n_name, 'customer_bal' AS side, customer_bal AS balance FROM wide
UNION ALL
SELECT n_name, 'supplier_bal' AS side, supplier_bal AS balance FROM wide
ORDER BY n_name, side
"""


QUERIES = {
    "q_pivot_orders": q_pivot_orders,
    "q_unpivot_balances": q_unpivot_balances,
}
ORACLES = {
    "q_pivot_orders": _pivot_sql(),
    "q_unpivot_balances": UNPIVOT_SQL,
}
