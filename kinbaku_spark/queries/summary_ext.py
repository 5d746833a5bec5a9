"""Graph summary card and label-noise detection.

The reference (kerighan/kinbaku) exposes only raw counts (SURVEY.md
§2.1 R15/R16); the graph card rolls the structural profile into one row
the way x_dataset_card does for the document corpus. Label-noise
detection is the confident-learning-style data-quality pass over the
embedding corpus.

Shuffle shapes (the 100 TB story):

- graph card: degree tables are two groupBys over the edge list; every
  later aggregate runs on O(|V|) rows; density uses wide-integer
  arithmetic (V² overflows int64 ppm math at billion-node scale).
- label noise: the cluster assignment is the zero-shuffle literal-
  centroid k-means pass; majority labels come from the O(k x labels)
  aggregate; the disagreement rollup is one more tiny groupBy.

Determinism: counts exact; density/share in integer ppm; majority ties
break on label text (the proven x_cluster_purity rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- g_graph_summary: the one-row structural card ----------------------------

def g_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural profile of the stored graph in one row: node/edge
    counts, bipartite density (edges over src-count x dst-count, ppm),
    max out/in degree, and the share of edges touching the top-out-degree
    hub — the capacity-planning numbers read before choosing partitioning
    and skew strategy.
    """
    from kinbaku_spark.queries.graph_queries import _graph

    g = _graph(spark, sf_dir)
    e = g.edges_df.select("src", "dst")
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    stats = (
        outd.agg(
            F.count(F.lit(1)).alias("n_src"),
            F.sum("d").alias("n_edges"),
            F.max("d").alias("max_out_degree"),
        )
        .crossJoin(
            ind.agg(
                F.count(F.lit(1)).alias("n_dst"),
                F.max("d").alias("max_in_degree"),
            )
        )
    )
    return stats.select(
        F.expr("n_src + n_dst").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_src").cast("long").alias("n_src"),
        F.col("n_dst").cast("long").alias("n_dst"),
        "max_out_degree",
        "max_in_degree",
        F.expr(
            "CAST(CAST(n_edges AS DECIMAL(38,0)) * 1000000"
            " div (CAST(n_src AS DECIMAL(38,0)) * n_dst) AS BIGINT)"
        ).alias("density_ppm"),
        F.expr("max_out_degree * 1000000 div n_edges").alias("hub_edge_share_ppm"),
    )


def _graph_summary_sql() -> str:
    from kinbaku_spark.queries.graph_queries import GRAPH_CTE

    return GRAPH_CTE + """
, outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM g_edges GROUP BY src),
ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS d FROM g_edges GROUP BY dst),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_src, CAST(SUM(d) AS BIGINT) AS n_edges,
         MAX(d) AS max_out_degree
  FROM outd
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dst, MAX(d) AS max_in_degree FROM ind
)
SELECT s.n_src + t.n_dst AS n_nodes, s.n_edges, s.n_src, t.n_dst,
       s.max_out_degree, t.max_in_degree,
       CAST(CAST(s.n_edges AS HUGEINT) * 1000000
            // (CAST(s.n_src AS HUGEINT) * t.n_dst) AS BIGINT) AS density_ppm,
       CAST((s.max_out_degree * 1000000) // s.n_edges AS BIGINT)
         AS hub_edge_share_ppm
FROM s CROSS JOIN t
"""


# -- x_label_noise_detect: within-cluster label disagreement -----------------

def x_label_noise_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning-style label-noise screen: vectors whose label
    disagrees with their k-means cluster's majority label, rolled up per
    label — the candidate-mislabel queue a data-quality reviewer works
    through. Reuses the deterministic cluster assignment and the
    majority-label rule of x_cluster_purity.
    """
    from kinbaku_spark.queries import kmeans_state

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_state.assignment(spark, sf_dir).select("vec_id", "cluster")
    labeled = assign.join(emb.select("vec_id", "label"), "vec_id")
    per = labeled.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    wmaj = Window.partitionBy("cluster").orderBy(F.desc("n"), "label")
    majority = (
        per.withColumn("rn", F.row_number().over(wmaj))
        .where(F.col("rn") == 1)
        .select("cluster", F.col("label").alias("majority_label"))
    )
    flagged = labeled.join(F.broadcast(majority), "cluster").withColumn(
        "disagree", (F.col("label") != F.col("majority_label")).cast("int")
    )
    return (
        flagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("disagree").cast("long").alias("n_disagree"),
        )
        .withColumn("noise_ppm", F.expr("n_disagree * 1000000 div n_vectors"))
        .orderBy("label")
    )


def _label_noise_sql() -> str:
    from kinbaku_spark.queries.pipeline_ext2 import kmeans_assign_cte

    return kmeans_assign_cte() + """
, labeled AS (
  SELECT a2.vec_id, a2.cluster, e.label
  FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
),
per AS (
  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n
  FROM labeled GROUP BY 1, 2
),
majority AS (
  SELECT cluster, label AS majority_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                 ORDER BY n DESC, label) AS rn
    FROM per
  ) WHERE rn = 1
)
SELECT l.label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CASE WHEN l.label <> m.majority_label THEN 1 ELSE 0 END)
         AS BIGINT) AS n_disagree,
       CAST(SUM(CASE WHEN l.label <> m.majority_label THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS noise_ppm
FROM labeled l JOIN majority m ON l.cluster = m.cluster
GROUP BY l.label
ORDER BY l.label
"""


QUERIES["g_graph_summary"] = g_graph_summary
ORACLES["g_graph_summary"] = _graph_summary_sql()
QUERIES["x_label_noise_detect"] = x_label_noise_detect
ORACLES["x_label_noise_detect"] = _label_noise_sql()
