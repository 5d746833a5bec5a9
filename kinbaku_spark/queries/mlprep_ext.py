"""ML feature-engineering operators: rolling time features, leave-one-out
target encoding, and kNN-graph hubness diagnostics.

The reference (kerighan/kinbaku) has no feature/statistics surface
(SURVEY.md §2.4); these extend the feature-pipeline layer on `orders` and
`embeddings`.

Shuffle shapes (the 100 TB story):

- rolling features: the fact table collapses to one row per DAY first
  (map-side partials); lags and the trailing-7-day window run over the
  tiny day series in a single-partition window (days are O(10^4) even
  for decades — the canonical pre-aggregate-then-window shape).
- target encoding: ONE groupBy(category) builds the (sum, count) state;
  the leave-one-out encodings are a broadcast join back + shuffle-free
  projection, re-aggregated per category — the fact table is scanned
  twice, shuffled never (beyond the tiny category aggregates).
- hubness: the pair space is corpus x corpus (gate-scale brute force);
  at 100 TB swap the pair generator for the IVF/LSH candidate join
  (x_ann_ivf_topk) and keep the identical rank/in-degree rollup.

Determinism: money in integer cents; LOO encodings in integer
micro-units via integer div; sims round to 6dp before ranking with
vec_id tiebreaks; rolling means are exact integer division of exact
integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_rolling_features: daily revenue lags + trailing mean ------------------

def x_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day revenue with lag-1, lag-7, and the trailing-7-day mean in
    integer cents — the standard autoregressive feature block for demand
    models. Day series is pre-aggregated, so every window is over the
    tiny day table.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    w = Window.orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    return (
        daily.withColumn("lag1_cents", F.lag("cents", 1).over(w))
        .withColumn("lag7_cents", F.lag("cents", 7).over(w))
        .withColumn("s7", F.sum("cents").over(w7))
        .withColumn("c7", F.count(F.lit(1)).over(w7))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_orders",
            "cents",
            "lag1_cents",
            "lag7_cents",
            F.expr("s7 div c7").alias("trail7_mean_cents"),
        )
        .orderBy("day")
    )


X_ROLLING_FEATURES_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_orders, cents,
       LAG(cents, 1) OVER (ORDER BY day) AS lag1_cents,
       LAG(cents, 7) OVER (ORDER BY day) AS lag7_cents,
       CAST(SUM(cents) OVER w7 // COUNT(*) OVER w7 AS BIGINT) AS trail7_mean_cents
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# -- x_target_encoding: leave-one-out category encoding ----------------------

def x_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value: each order's encoding is the mean of all OTHER orders in its
    category ((sum - own) / (n - 1), integer micro-cents) — the
    leakage-safe categorical encoder. Reported as per-category
    min/max/sum of the row encodings so the full 1:1 encoding is
    checksummed without hashing the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    rows = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    stats = rows.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
    )
    enc = rows.join(F.broadcast(stats), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        F.expr("(s - cents) * 100 div (n - 1)").alias("loo_microcents"),
    )
    return (
        enc.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.min("loo_microcents").alias("min_loo"),
            F.max("loo_microcents").alias("max_loo"),
            F.sum("loo_microcents").alias("sum_loo"),
        )
        .orderBy("o_orderpriority")
    )


X_TARGET_ENCODING_SQL = """
WITH rows_ AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
stats AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM rows_ GROUP BY 1
),
enc AS (
  SELECT r.o_orderpriority, t.n,
         ((t.s - r.cents) * 100) // (t.n - 1) AS loo_microcents
  FROM rows_ r JOIN stats t USING (o_orderpriority)
)
SELECT o_orderpriority,
       MAX(n) AS n_orders,
       CAST(MIN(loo_microcents) AS BIGINT) AS min_loo,
       CAST(MAX(loo_microcents) AS BIGINT) AS max_loo,
       CAST(SUM(loo_microcents) AS BIGINT) AS sum_loo
FROM enc
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- x_knn_hubness: in-degree distribution of the k-NN graph -----------------

KNN_K = 3


def x_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic of the embedding space: build the cosine k-NN
    graph (k=3) and report the in-degree histogram — skewed in-degrees
    (hub vectors appearing in everyone's neighbor list) are the classic
    symptom of degraded high-dimensional similarity search.

    Gate-scale pair generation is brute force; the rank/in-degree rollup
    is pair-count-bounded and reusable over an IVF/LSH candidate join at
    scale.
    """
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    # corpus rides to every task as a broadcast numpy block (the literal-
    # centroid pattern); the pair space never materializes JVM-side — each
    # Arrow batch of query rows scores against the whole block with the
    # SAME dim-sequential left-fold as F.aggregate (proven bit-identical
    # by x_ann_pandas_topk), so the JVM-side round/rank below sees the
    # exact numbers the expression path would produce
    corpus = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    c_ids = [int(r["vec_id"]) for r in corpus]
    c_vecs = [[float(v) for v in r["embedding"]] for r in corpus]
    c_norms = []
    for vec in c_vecs:
        s = 0.0
        for v in vec:
            s += v * v
        c_norms.append(math.sqrt(s))
    bc = spark.sparkContext.broadcast((c_ids, c_vecs, c_norms))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        ids, vecs, norms = bc.value
        cid = np.array(ids, dtype=np.int64)
        cmat = np.array(vecs, dtype=np.float64)  # (m, d)
        cn = np.array(norms, dtype=np.float64)
        m, dim = cmat.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.stack(pdf["embedding"].to_numpy())  # (n, d)
            qid = pdf["vec_id"].to_numpy().astype(np.int64)
            n = len(qid)
            acc = np.zeros((n, m), dtype=np.float64)
            qn = np.zeros(n, dtype=np.float64)
            for d in range(dim):  # sequential over dims (left fold),
                x = qmat[:, d].astype(np.float64)  # vectorized over pairs
                acc = acc + np.outer(x, cmat[:, d])
                qn = qn + x * x
            sim = acc / (np.sqrt(qn)[:, None] * cn[None, :])
            out_q = np.repeat(qid, m)
            out_c = np.tile(cid, n)
            keep = out_q != out_c
            yield pd.DataFrame(
                {
                    "qid": out_q[keep],
                    "cid": out_c[keep],
                    "sim": sim.ravel()[keep],
                }
            )

    sims = (
        emb.select("vec_id", "embedding")
        .mapInPandas(kernel, "qid bigint, cid bigint, sim double")
        .select("qid", "cid", F.round("sim", 6).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "cid")
    knn = sims.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= KNN_K)
    indeg = knn.groupBy("cid").agg(F.count(F.lit(1)).alias("in_degree"))
    all_ids = emb.select(F.col("vec_id").alias("cid"))
    return (
        all_ids.join(indeg, "cid", "left")
        .select(F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"))
        .groupBy("in_degree")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("in_degree")
    )


def _knn_hubness_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine

    return f"""
WITH sims AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
         ROUND({_sql_cosine('a.embedding', 'b.embedding')}, 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
knn AS (
  SELECT qid, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY sim DESC, cid) AS rn
    FROM sims
  ) WHERE rn <= {KNN_K}
),
indeg AS (
  SELECT e.vec_id,
         CAST(COALESCE(k.c, 0) AS BIGINT) AS in_degree
  FROM embeddings e
  LEFT JOIN (SELECT cid, COUNT(*) AS c FROM knn GROUP BY cid) k
    ON k.cid = e.vec_id
)
SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM indeg
GROUP BY in_degree
ORDER BY in_degree
"""


QUERIES["x_rolling_features"] = x_rolling_features
ORACLES["x_rolling_features"] = X_ROLLING_FEATURES_SQL
QUERIES["x_target_encoding"] = x_target_encoding
ORACLES["x_target_encoding"] = X_TARGET_ENCODING_SQL
QUERIES["x_knn_hubness"] = x_knn_hubness
ORACLES["x_knn_hubness"] = _knn_hubness_sql()
