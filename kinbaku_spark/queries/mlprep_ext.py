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
KNN_BLOCKS = 8


def x_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic of the embedding space: build the cosine k-NN
    graph (k=3) and report the in-degree histogram — skewed in-degrees
    (hub vectors appearing in everyone's neighbor list) are the classic
    symptom of degraded high-dimensional similarity search.

    Pair generation is distributed BLOCK MATRIX MULTIPLY — no driver
    collect, no Python-side corpus broadcast (round-1's anti-pattern):
    both sides are hashed into KNN_BLOCKS row-blocks, the B x B block
    pairs cross-join JVM-side (each carries one query chunk + one corpus
    chunk, so Arrow transfer is O(n*B + m*B) vectors, never the n*m pair
    space), and each task GEMMs its block pair with the SAME
    dim-sequential left-fold the DuckDB oracle replays (proven
    bit-identical by x_ann_pandas_topk). Per-block top-k on the rounded
    key (round is monotone, so block-local and global orderings agree)
    keeps only B*k candidates per query for the global rank. At 100 TB
    B scales with corpus so blocks fit executor memory, or the identical
    rank/in-degree tail runs over IVF/LSH candidates (similarity.py
    ivf_topk) instead of exact all-pairs.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    B = KNN_BLOCKS
    blk = emb.select(
        F.pmod(F.col("vec_id"), F.lit(B)).alias("g"),
        F.struct("vec_id", "embedding").alias("ve"),
    ).groupBy("g").agg(F.collect_list("ve").alias("vs"))
    pairs = (
        blk.select(F.col("vs").alias("qs"))
        .crossJoin(blk.select(F.col("vs").alias("cs")))
        .repartition(B * B)
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for qs, cs in zip(pdf["qs"], pdf["cs"]):
                qid = np.array([r["vec_id"] for r in qs], dtype=np.int64)
                cid = np.array([r["vec_id"] for r in cs], dtype=np.int64)
                qmat = np.array([r["embedding"] for r in qs], dtype=np.float64)
                cmat = np.array([r["embedding"] for r in cs], dtype=np.float64)
                n, dim = qmat.shape
                m = len(cid)
                # dim-sequential left fold == F.aggregate == the SQL oracle
                acc = np.zeros((n, m), dtype=np.float64)
                qn = np.zeros(n, dtype=np.float64)
                cn = np.zeros(m, dtype=np.float64)
                for d in range(dim):
                    x = qmat[:, d]
                    y = cmat[:, d]
                    acc = acc + np.outer(x, y)
                    qn = qn + x * x
                    cn = cn + y * y
                sim = np.round(acc / (np.sqrt(qn)[:, None] * np.sqrt(cn)[None, :]), 6)
                sim[qid[:, None] == cid[None, :]] = -np.inf  # self-pairs out
                # block-local top-k by (sim desc, cid asc) — same composite
                # key as the global window, so pruning is exact
                order = np.lexsort((np.broadcast_to(cid, (n, m)), -sim), axis=1)
                take = order[:, : min(KNN_K, m)]
                rows_sim = np.take_along_axis(sim, take, axis=1).ravel()
                keep = np.isfinite(rows_sim)
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(qid, take.shape[1])[keep],
                        "cid": cid[take.ravel()][keep],
                        "sim": rows_sim[keep],
                    }
                )

    sims = pairs.mapInPandas(kernel, "qid bigint, cid bigint, sim double")
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
