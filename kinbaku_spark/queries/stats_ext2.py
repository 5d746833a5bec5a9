"""Seasonality profiling and exact-moment correlation.

The reference (kerighan/kinbaku) has no statistics surface (SURVEY.md
§2.4); these extend the BI/statistics layer on `orders` and `lineitem`.

Shuffle shapes (the 100 TB story):

- seasonality: ONE groupBy over (month, weekday) — 84 output cells with
  map-side partials; the share normalization runs on the tiny aggregate
  via a single-partition window.
- correlation: the five Pearson moments (n, Σx, Σy, Σxy, Σx², Σy²) are
  exact integer partial aggregates — the whole fact table collapses
  map-side to one row per group; no second pass, no row shuffle.

Determinism: moments are exact BIGINTs on integer-quantized inputs
(quantity is integral; price floored to whole units); the final Pearson
expression runs in exact wide-integer arithmetic (Spark DECIMAL(38,0),
DuckDB HUGEINT — both exact at these magnitudes) and converts to double
only at the last division, so both engines round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_order_seasonality: month x weekday demand profile ---------------------

def x_order_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-volume seasonality: count, corpus share (ppm), and average
    order value (integer cents) per (month, ISO weekday) cell — the
    calendar-heatmap profile behind demand forecasting features.

    Weekday is Monday=0 in both engines (Spark `weekday`, DuckDB
    `isodow - 1`) — the classic cross-dialect day-numbering trap, pinned
    here explicitly.
    """
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.month("o_orderdate").alias("month"),
        F.weekday("o_orderdate").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("sc"),
    )
    w = Window.partitionBy()
    return (
        cells.withColumn("tot", F.sum("n_orders").over(w))
        .select(
            "month",
            "dow",
            "n_orders",
            F.expr("n_orders * 1000000 div tot").alias("share_ppm"),
            F.expr("sc div n_orders").alias("avg_price_cents"),
        )
        .orderBy("month", "dow")
    )


X_ORDER_SEASONALITY_SQL = """
WITH cells AS (
  SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
         CAST(isodow(o_orderdate) - 1 AS INTEGER) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sc
  FROM orders GROUP BY 1, 2
)
SELECT month, dow, n_orders,
       CAST((n_orders * 1000000) // SUM(n_orders) OVER () AS BIGINT) AS share_ppm,
       CAST(sc // n_orders AS BIGINT) AS avg_price_cents
FROM cells
ORDER BY month, dow
"""


# -- x_qty_price_corr: exact-moment Pearson correlation per group ------------

def x_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between line quantity and extended price per
    return flag, via exact integer moments (the one-pass distributed
    corr; cites the same pattern as g_assortativity) — Spark's built-in
    `corr` sums doubles in partition order and would not replay.

    x = quantity (integral), y = floor(price) whole units. The final
    expression is computed in DECIMAL(38,0) (DuckDB: HUGEINT) because
    n·Σy² overflows int64 at scale; both are exact, so the one
    double-conversion at the end is bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    xy = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    d38 = "decimal(38,0)"
    mom = xy.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).cast("long").alias("sx"),
        F.sum(F.col("y").cast(d38)).cast("long").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast("long").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast("long").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast("long").alias("syy"),
    )
    n = F.col("n").cast(d38)
    sx, sy = F.col("sx").cast(d38), F.col("sy").cast(d38)
    sxy, sxx, syy = (
        F.col("sxy").cast(d38),
        F.col("sxx").cast(d38),
        F.col("syy").cast(d38),
    )
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
        (n * syy - sy * sy).cast("double")
    )
    return mom.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        "sxy",
        F.round(num / den, 6).alias("corr"),
    ).orderBy("l_returnflag")


X_QTY_PRICE_CORR_SQL = """
WITH xy AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
mom AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM xy GROUP BY l_returnflag
)
SELECT l_returnflag, n, sx, sy, sxy,
       ROUND(
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))),
         6) AS corr
FROM mom
ORDER BY l_returnflag
"""


QUERIES["x_order_seasonality"] = x_order_seasonality
ORACLES["x_order_seasonality"] = X_ORDER_SEASONALITY_SQL
QUERIES["x_qty_price_corr"] = x_qty_price_corr
ORACLES["x_qty_price_corr"] = X_QTY_PRICE_CORR_SQL
