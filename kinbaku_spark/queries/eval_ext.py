"""Model/data evaluation operators: k-means cluster purity, retrieval MRR,
and winsorized (outlier-clipped) statistics.

The reference (kerighan/kinbaku) has no vector or statistics surface
(SURVEY.md §2.4); these extend the ML-evaluation layer over `embeddings`
and `lineitem`.

Shuffle shapes (the 100 TB story):

- cluster purity: the assignment pass is the zero-shuffle literal-centroid
  k-means projection (operators/similarity.py); the purity rollup is one
  groupBy over (cluster, label) — output O(k x labels).
- MRR: anchors (a fixed, tiny probe set) broadcast against the corpus —
  the fact side never shuffles for the similarity scan; the per-anchor
  rank is a window over anchor-partitioned candidate rows (fan-out =
  |anchors| x corpus, bounded by the probe-set size, the same shape as
  x_hard_negatives).
- winsorized stats: quantile cutpoints come from the VALUE HISTOGRAM
  (groupBy distinct cents + cumulative window over distinct values), not
  a global row sort — the classic scalable order-statistic trick; the
  clipped re-aggregate is one more scan with map-side partials.

Determinism: sims round to 6dp before ranking (ties break on vec_id);
reciprocal ranks and means are exact integer ppm/cents (integer div);
the k-th order statistic is selected as "min value with cumulative count
>= k" — tie-order-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.operators.similarity import cosine
from kinbaku_spark.operators.rank import prefix_sums
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_cluster_purity: k-means clusters vs gold labels -----------------------

def x_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster purity of the deterministic k-means clustering against
    the labeled `label` column: majority label, its share in exact ppm —
    the standard external clustering-quality check (purity / homogeneity).
    """
    from kinbaku_spark.queries import kmeans_state

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_state.assignment(spark, sf_dir).select("vec_id", "cluster")
    per = (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n"), "label")
    return (
        per.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.sum("n").over(Window.partitionBy("cluster")))
        .where(F.col("rn") == 1)
        .select(
            "cluster",
            "n_members",
            F.col("label").alias("top_label"),
            F.col("n").alias("n_top"),
            F.expr("n * 1000000 div n_members").alias("purity_ppm"),
        )
        .orderBy("cluster")
    )


def _cluster_purity_sql() -> str:
    from kinbaku_spark.queries.pipeline_ext2 import kmeans_assign_cte

    return kmeans_assign_cte() + """
, per AS (
  SELECT a2.cluster, e.label, CAST(COUNT(*) AS BIGINT) AS n
  FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
  GROUP BY a2.cluster, e.label
),
ranked AS (
  SELECT cluster, label, n,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn,
         SUM(n) OVER (PARTITION BY cluster) AS n_members
  FROM per
)
SELECT cluster, CAST(n_members AS BIGINT) AS n_members, label AS top_label,
       n AS n_top, CAST((n * 1000000) // n_members AS BIGINT) AS purity_ppm
FROM ranked WHERE rn = 1
ORDER BY cluster
"""


# -- x_mrr_eval: mean reciprocal rank of same-label retrieval ----------------

MRR_N_ANCHORS = 16


def x_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality of the raw embedding space: for each of the
    first 16 vectors (the probe set), rank the whole corpus by cosine
    and report the rank of the first SAME-label hit plus its reciprocal
    in exact ppm — the label-as-relevance MRR eval run after every
    embedding-model change.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < MRR_N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("avec"),
    )
    cand = (
        F.broadcast(anchors)
        .crossJoin(emb.select("vec_id", "label", "embedding"))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            "label",
            F.round(cosine(F.col("avec"), F.col("embedding")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("label") == F.col("anchor_label"))
        .groupBy("anchor_id", "anchor_label")
        .agg(F.min("rank").alias("first_hit_rank"))
        .withColumn("rr_ppm", F.expr("1000000 div first_hit_rank"))
        .orderBy("anchor_id")
    )


def _mrr_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine

    return f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS avec
  FROM embeddings WHERE vec_id < {MRR_N_ANCHORS}
),
cand AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
         ROUND({_sql_cosine('a.avec', 'e.embedding')}, 6) AS sim
  FROM anchors a CROSS JOIN embeddings e
  WHERE e.vec_id <> a.anchor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY sim DESC, vec_id) AS rank
  FROM cand
)
SELECT anchor_id, anchor_label,
       CAST(MIN(rank) AS INTEGER) AS first_hit_rank,
       CAST(1000000 // MIN(rank) AS BIGINT) AS rr_ppm
FROM ranked
WHERE label = anchor_label
GROUP BY anchor_id, anchor_label
ORDER BY anchor_id
"""


# -- x_winsorized_stats: p01/p99-clipped price statistics --------------------

def x_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized l_extendedprice statistics: p01/p99 cutpoints from the
    distinct-value histogram (min value whose cumulative count reaches
    ceil(q*n) — no global row sort), then one clipped re-aggregate. The
    outlier-robust mean every metrics pipeline reports next to the raw
    mean; all in exact integer cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    hist = cents.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    # the histogram feeds the prefix sums, the totals AND the final
    # aggregate — EAGER pin: the totals broadcast and the prefix-sums
    # offset broadcasts are independent stages that race a lazy pin's
    # materialization, each re-running the groupBy shuffle (r07
    # re-measure: 3.4 MB shuffled unpinned -> 10.6 lazy -> once eager)
    hist = hist.localCheckpoint(eager=True)
    # exact running counts via range-parallel prefix sums (operators/
    # rank.py) — unconditional at any value-domain size
    cum = prefix_sums(hist, [F.col("c")], {"cum": "cnt"})
    # totals FROM the histogram (n = Σcnt, s = Σ c·cnt — exact integer
    # identities), not a second corpus pass; and the final aggregate runs
    # over the weighted histogram, not a third corpus pass (guide §1.2):
    # every output is a sum of a function of c, so Σ_rows f(c) = Σ_hist
    # f(c)·cnt bit-for-bit
    totals = hist.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("c") * F.col("cnt")).alias("s"),
    )
    bounds = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.min(F.when(F.col("cum") >= F.expr("(n + 99) div 100"), F.col("c")))
            .alias("lo_cents"),
            F.min(F.when(F.col("cum") >= F.expr("(n * 99 + 99) div 100"), F.col("c")))
            .alias("hi_cents"),
        )
    )
    return (
        hist.crossJoin(F.broadcast(bounds))
        .select(
            "c",
            "cnt",
            "lo_cents",
            "hi_cents",
            F.greatest(F.least(F.col("c"), F.col("hi_cents")), F.col("lo_cents"))
            .alias("w"),
        )
        .groupBy("lo_cents", "hi_cents")
        .agg(
            F.sum("cnt").cast("long").alias("n_items"),
            F.sum(F.when(F.col("c") < F.col("lo_cents"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("c") > F.col("hi_cents"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_clip_hi"),
            F.expr("sum(c * cnt) div sum(cnt)").alias("mean_cents"),
            F.expr("sum(w * cnt) div sum(cnt)").alias("winsorized_mean_cents"),
        )
        .select(
            "n_items",
            "lo_cents",
            "hi_cents",
            "n_clip_lo",
            "n_clip_hi",
            "mean_cents",
            "winsorized_mean_cents",
        )
    )


X_WINSORIZED_SQL = """
WITH cents AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
),
hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM cents GROUP BY c),
cum AS (
  SELECT c, SUM(cnt) OVER (ORDER BY c
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s FROM cents),
bounds AS (
  SELECT MIN(CASE WHEN cum >= (n + 99) // 100 THEN c END) AS lo_cents,
         MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN c END) AS hi_cents
  FROM cum CROSS JOIN totals
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       b.lo_cents, b.hi_cents,
       CAST(SUM(CASE WHEN c < b.lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       CAST(SUM(CASE WHEN c > b.hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_cents,
       CAST(SUM(GREATEST(LEAST(c, b.hi_cents), b.lo_cents)) // COUNT(*) AS BIGINT)
         AS winsorized_mean_cents
FROM cents CROSS JOIN bounds b
GROUP BY b.lo_cents, b.hi_cents
"""


QUERIES["x_cluster_purity"] = x_cluster_purity
ORACLES["x_cluster_purity"] = _cluster_purity_sql()
QUERIES["x_mrr_eval"] = x_mrr_eval
ORACLES["x_mrr_eval"] = _mrr_sql()
QUERIES["x_winsorized_stats"] = x_winsorized_stats
ORACLES["x_winsorized_stats"] = X_WINSORIZED_SQL


# -- x_ndcg_eval: nDCG@k with a fixed integer discount table ------------------
#
# The log2 discounts are PRECOMPUTED Python constants rendered as literals
# into both engines (floor(10^6 / log2(rank+1))), so the metric stays
# integer-exact end-to-end — no cross-engine transcendental drift. Binary
# relevance = same label as the anchor (the MRR eval's convention).

NDCG_K = 10
NDCG_N_ANCHORS = 8
NDCG_DISCOUNT_PPM = [
    1000000, 630929, 500000, 430676, 386852,
    356207, 333333, 315464, 301029, 289064,
]
NDCG_IDEAL_PREFIX = [
    sum(NDCG_DISCOUNT_PPM[:i]) for i in range(NDCG_K + 1)
]  # IDEAL_PREFIX[r] = best possible DCG with r relevant docs in the top k


def x_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@`NDCG_K` of the raw embedding space for the first
    `NDCG_N_ANCHORS` vectors: cosine-rank the corpus per anchor, credit
    same-label hits in the top k with the fixed integer log2-discount
    table, and normalize by the ideal DCG given how many same-label docs
    exist (capped at k). Anchors with no same-label doc are skipped in
    both engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < NDCG_N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("avec"),
    )
    label_n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    cand = (
        F.broadcast(anchors)
        .crossJoin(emb.select("vec_id", "label", "embedding"))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "label",
            F.round(cosine(F.col("avec"), F.col("embedding")), 6).alias("sim"),
            F.col("vec_id"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), "vec_id")
    disc = F.array(*[F.lit(d).cast("long") for d in NDCG_DISCOUNT_PPM])
    ideal = F.array(*[F.lit(d).cast("long") for d in NDCG_IDEAL_PREFIX])
    dcg = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= NDCG_K)
        .groupBy("anchor_id", "anchor_label")
        .agg(
            F.sum(
                F.when(
                    F.col("label") == F.col("anchor_label"),
                    F.element_at(disc, F.col("rank")),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("dcg_ppm")
        )
    )
    return (
        dcg.join(
            F.broadcast(label_n),
            dcg.anchor_label == label_n.label,
        )
        .select(
            "anchor_id",
            F.least(F.col("n_label") - 1, F.lit(NDCG_K))
            .cast("int")
            .alias("n_rel"),
            "dcg_ppm",
            F.element_at(
                ideal,
                (F.least(F.col("n_label") - 1, F.lit(NDCG_K)) + 1).cast("int"),
            ).alias("idcg_ppm"),
        )
        .where(F.col("idcg_ppm") > 0)
        .select(
            "anchor_id",
            "n_rel",
            "dcg_ppm",
            "idcg_ppm",
            F.expr(
                "CAST(CAST(dcg_ppm AS DECIMAL(38,0)) * 1000000"
                " div idcg_ppm AS BIGINT)"
            ).alias("ndcg_ppm"),
        )
        .orderBy("anchor_id")
    )


def _ndcg_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine

    disc_arr = "[" + ", ".join(str(d) for d in NDCG_DISCOUNT_PPM) + "]"
    ideal_arr = "[" + ", ".join(str(d) for d in NDCG_IDEAL_PREFIX) + "]"
    return f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS avec
  FROM embeddings WHERE vec_id < {NDCG_N_ANCHORS}
),
label_n AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
  FROM embeddings GROUP BY label
),
cand AS (
  SELECT a.anchor_id, a.anchor_label, e.label, e.vec_id,
         ROUND({_sql_cosine('a.avec', 'e.embedding')}, 6) AS sim
  FROM anchors a CROSS JOIN embeddings e
  WHERE e.vec_id <> a.anchor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY sim DESC, vec_id) AS rank
  FROM cand
),
dcg AS (
  SELECT anchor_id, anchor_label,
         CAST(SUM(CASE WHEN label = anchor_label
                       THEN ({disc_arr})[rank] ELSE 0 END) AS BIGINT)
           AS dcg_ppm
  FROM ranked WHERE rank <= {NDCG_K}
  GROUP BY anchor_id, anchor_label
)
SELECT d.anchor_id,
       CAST(LEAST(l.n_label - 1, {NDCG_K}) AS INTEGER) AS n_rel,
       d.dcg_ppm,
       CAST(({ideal_arr})[LEAST(l.n_label - 1, {NDCG_K}) + 1] AS BIGINT)
         AS idcg_ppm,
       CAST(CAST(d.dcg_ppm AS HUGEINT) * 1000000
            // ({ideal_arr})[LEAST(l.n_label - 1, {NDCG_K}) + 1]
            AS BIGINT) AS ndcg_ppm
FROM dcg d JOIN label_n l ON l.label = d.anchor_label
WHERE ({ideal_arr})[LEAST(l.n_label - 1, {NDCG_K}) + 1] > 0
ORDER BY d.anchor_id
"""


QUERIES["x_ndcg_eval"] = x_ndcg_eval
ORACLES["x_ndcg_eval"] = _ndcg_sql()
