"""Pattern-mining depth and lifecycle labeling: frequent 3-itemsets,
churn-segment label generation, and graph degree inequality.

The reference (kerighan/kinbaku) has no mining/label surface (SURVEY.md
§2.4); these extend pattern mining (x_market_basket's pairs -> triples),
the label-engineering layer on `events`, and the graph-metric layer.

Shuffle shapes (the 100 TB story):

- 3-itemsets: the proven basket shape — ONE shuffle on the order key
  builds sorted per-basket arrays; triples are generated MAP-SIDE from
  each bounded array (no 3-way self-join of the incidence table); the
  triple aggregate is support-pruned. Baskets below 3 items are dropped
  before combination generation (also guards Spark's descending
  sequence(i, j<i) trap).
- churn labels: (user, half) presence collapses map-side; the
  segment label is a full-outer join of two tiny user sets; one rollup.
- degree Gini: degrees are one groupBy(src); the rank window runs over
  the degree table (|V|, not |E|); moments are one scalar aggregate in
  wide-integer arithmetic.

Determinism: triples come from sorted distinct arrays so a<b<c sets are
identical in both engines; Gini uses the exact integer formula in
DECIMAL(38,0)/HUGEINT; ratios are integer ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.operators.rank import ranked as dist_ranked
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_itemsets3: frequent 3-itemsets ----------------------------------------

ITEMSET3_MIN_SUPPORT = 2


def x_itemsets3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part triples across order baskets (support >= 2) — the
    level-3 a-priori pass on top of x_market_basket's pairs. Triples are
    enumerated map-side from each basket's sorted item array, so the
    incidence table is never self-joined.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
        )
        .distinct()
    )
    baskets = (
        items.groupBy("okey")
        .agg(F.array_sort(F.collect_list("part")).alias("parts"))
        .where(F.size("parts") >= 3)
    )
    triples = baskets.select(
        F.explode(
            F.expr(
                """
                flatten(flatten(
                  transform(sequence(0, size(parts) - 3), i ->
                    transform(sequence(i + 1, size(parts) - 2), j ->
                      transform(sequence(j + 1, size(parts) - 1), k ->
                        struct(parts[i] AS p1, parts[j] AS p2, parts[k] AS p3))))))
                """
            )
        ).alias("t")
    ).select("t.p1", "t.p2", "t.p3")
    return (
        triples.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= ITEMSET3_MIN_SUPPORT)
        .orderBy(F.desc("support"), "p1", "p2", "p3")
    )


X_ITEMSETS3_SQL = f"""
WITH inc AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
)
SELECT a.part AS p1, b.part AS p2, c.part AS p3,
       CAST(COUNT(*) AS BIGINT) AS support
FROM inc a
JOIN inc b ON a.okey = b.okey AND a.part < b.part
JOIN inc c ON a.okey = c.okey AND b.part < c.part
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {ITEMSET3_MIN_SUPPORT}
ORDER BY support DESC, p1, p2, p3
"""


# -- x_churn_labels: lifecycle segment generation ----------------------------

CHURN_SPLIT = "2024-01-16"  # events span Jan 2024; halves the window


def x_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle labels from two activity windows: users active only in
    the first half are `churned`, only in the second `new`, in both
    `retained` — the label-generation step of every churn model, with
    per-segment activity averages as the sanity readout.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(CHURN_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("w1"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("w2"),
    )
    seg = F.when((F.col("w1") > 0) & (F.col("w2") > 0), "retained").when(
        F.col("w1") > 0, "churned"
    ).otherwise("new")
    return (
        per_user.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("w1").cast("long").alias("w1_events"),
            F.sum("w2").cast("long").alias("w2_events"),
        )
        .orderBy("segment")
    )


X_CHURN_LABELS_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         SUM(CASE WHEN ts < TIMESTAMP '{CHURN_SPLIT}' THEN 1 ELSE 0 END) AS w1,
         SUM(CASE WHEN ts >= TIMESTAMP '{CHURN_SPLIT}' THEN 1 ELSE 0 END) AS w2
  FROM events GROUP BY user_id
)
SELECT CASE WHEN w1 > 0 AND w2 > 0 THEN 'retained'
            WHEN w1 > 0 THEN 'churned'
            ELSE 'new' END AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(w1) AS BIGINT) AS w1_events,
       CAST(SUM(w2) AS BIGINT) AS w2_events
FROM per_user
GROUP BY 1
ORDER BY 1
"""


# -- g_degree_gini: degree inequality of the graph ---------------------------

def g_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier out-degrees — one number for how
    hub-dominated the graph's wiring is (the skew the salted operators
    in operators/skew.py exist for). Exact integer Gini over the
    |V|-sized degree table.
    """
    from kinbaku_spark.queries.graph_queries import _graph

    g = _graph(spark, sf_dir)
    deg = g.edges_df.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # exact global rank without a single-partition window (rank.py)
    ranked = dist_ranked(deg, [F.col("d"), F.col("src")], "rank")
    d38 = "decimal(38,0)"
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d").cast(d38)).cast("long").alias("total_edges"),
        F.sum(F.col("rank").cast(d38) * F.col("d").cast(d38)).cast(d38).alias("srx"),
    )
    gini_ppm = F.expr(
        "CAST(2 AS DECIMAL(38,0)) * srx * 1000000"
        " div (CAST(n_nodes AS DECIMAL(38,0)) * total_edges)"
        " - CAST(n_nodes + 1 AS DECIMAL(38,0)) * 1000000 div n_nodes"
    ).cast("long")
    return mom.select("n_nodes", "total_edges", gini_ppm.alias("gini_ppm"))


def _degree_gini_sql() -> str:
    from kinbaku_spark.queries.graph_queries import GRAPH_CTE

    return GRAPH_CTE + """
, deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM g_edges GROUP BY src),
ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY d, src) AS rank FROM deg),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d) AS BIGINT) AS total_edges,
         SUM(CAST(rank AS HUGEINT) * d) AS srx
  FROM ranked
)
SELECT n_nodes, total_edges,
       CAST(CAST(2 AS HUGEINT) * srx * 1000000
              // (CAST(n_nodes AS HUGEINT) * total_edges)
            - CAST(n_nodes + 1 AS HUGEINT) * 1000000 // n_nodes
         AS BIGINT) AS gini_ppm
FROM mom
"""


QUERIES["x_itemsets3"] = x_itemsets3
ORACLES["x_itemsets3"] = X_ITEMSETS3_SQL
QUERIES["x_churn_labels"] = x_churn_labels
ORACLES["x_churn_labels"] = X_CHURN_LABELS_SQL
QUERIES["g_degree_gini"] = g_degree_gini
ORACLES["g_degree_gini"] = _degree_gini_sql()
