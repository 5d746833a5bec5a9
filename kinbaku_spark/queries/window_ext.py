"""RANGE-frame windows over sparse time series, and the rich-club
coefficient of the derived graph.

The reference (kerighan/kinbaku) has no window/metric surface (SURVEY.md
§2.4); these extend the window-function and graph-metric layers.

Shuffle shapes (the 100 TB story):

- range-frame revenue: the fact table pre-aggregates to one row per DAY
  (map-side partials); the trailing-30-day RANGE frame runs over the
  tiny sparse day series. ROWS frames silently under-count when days
  are missing — this operator exists to pin the RANGE semantics.
- rich club: degrees are one groupBy; the top-K selection is a
  TakeOrdered over |V|; the projection pair count self-joins only the
  K-node incidence slice (bounded fan-out), never the full edge table.

Determinism: day ordering keys are integer epoch-days in BOTH engines
(identical RANGE frame membership); sums in integer cents; the
coefficient is integer ppm; top-K ties break on node key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_range_frame_revenue: trailing 30-day sums over a sparse series --------

def x_range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-day: day revenue plus the trailing-30-day revenue and
    active-day count via a RANGE frame keyed on integer epoch-days —
    correct over the sparse order calendar where a ROWS frame would
    reach back a fixed row count and silently span months.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    keyed = daily.withColumn(
        "epoch_day", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    w = Window.orderBy("epoch_day").rangeBetween(-29, 0)
    return (
        keyed.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            F.sum("cents").over(w).alias("trail30_cents"),
            F.count(F.lit(1)).over(w).cast("long").alias("trail30_active_days"),
        )
        .orderBy("day")
    )


X_RANGE_FRAME_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
keyed AS (
  SELECT day, cents, datediff('day', DATE '1970-01-01', day) AS epoch_day
  FROM daily
)
SELECT strftime(day, '%Y-%m-%d') AS day, cents,
       CAST(SUM(cents) OVER w AS BIGINT) AS trail30_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail30_active_days
FROM keyed
WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# -- g_rich_club: connectivity among the highest-degree nodes ----------------

RICH_K = 8


def g_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient: among the top-8 suppliers by out-degree,
    the fraction of possible co-supply links (sharing >= 1 part) that
    actually exist, in ppm — do the hubs form a club? Only the 8-node
    incidence slice is self-joined.
    """
    from kinbaku_spark.queries.graph_queries import _graph

    e = _graph(spark, sf_dir).edges_df
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # distributed top-k (TakeOrderedAndProject: per-partition K-heaps),
    # never a row_number window ranking every node's degree
    top = deg.orderBy(F.desc("d"), "src").limit(RICH_K).select("src")
    inc = e.join(F.broadcast(top), "src").select("src", "dst").distinct()
    pairs = (
        inc.select(F.col("src").alias("a"), F.col("dst").alias("p"))
        .join(inc.select(F.col("src").alias("b"), F.col("dst").alias("p")), "p")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    n_links = pairs.agg(F.count(F.lit(1)).alias("n_links"))
    k = F.lit(RICH_K)
    return n_links.select(
        k.cast("long").alias("k"),
        "n_links",
        F.expr(f"n_links * 1000000 div ({RICH_K} * ({RICH_K} - 1) div 2)").alias(
            "rich_club_ppm"
        ),
    )


def _rich_club_sql() -> str:
    from kinbaku_spark.queries.graph_queries import GRAPH_CTE

    return GRAPH_CTE + f"""
, deg AS (SELECT src, COUNT(*) AS d FROM g_edges GROUP BY src),
top AS (
  SELECT src FROM (
    SELECT src, ROW_NUMBER() OVER (ORDER BY d DESC, src) AS rn FROM deg
  ) WHERE rn <= {RICH_K}
),
inc AS (
  SELECT DISTINCT e.src, e.dst FROM g_edges e JOIN top t ON e.src = t.src
),
pairs AS (
  SELECT DISTINCT a.src AS a, b.src AS b
  FROM inc a JOIN inc b ON a.dst = b.dst AND a.src < b.src
)
SELECT CAST({RICH_K} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(*) * 1000000 // ({RICH_K} * ({RICH_K} - 1) // 2) AS BIGINT)
         AS rich_club_ppm
FROM pairs
"""


QUERIES["x_range_frame_revenue"] = x_range_frame_revenue
ORACLES["x_range_frame_revenue"] = X_RANGE_FRAME_SQL
QUERIES["g_rich_club"] = g_rich_club
ORACLES["g_rich_club"] = _rich_club_sql()
