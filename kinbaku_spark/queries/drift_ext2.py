"""Drift/diversity operators, batch 2: pairwise source vocabulary drift
and per-source topic diversity — the corpus-mixing readouts that decide
source weights before a training run.

The reference (kerighan/kinbaku) has no text/statistics surface
(SURVEY.md §2.4); these extend the drift family (drift_ext.py) from
value distributions to token and topic distributions.

- vocab drift: total-variation distance between every source PAIR's
  unigram profile over the corpus-wide top-`DRIFT_VOCAB` words. ONE
  tokenize+count shuffle (vocab-bounded), a distributed top-k for the
  shared vocabulary, then all pairwise distances run on the
  (sources × top-k)-sized profile table — never on the corpus.
- topic diversity: Simpson's index per source over k-means topic cells
  (1 − Σ n_c(n_c−1) / N(N−1), the probability two random docs from the
  source land in DIFFERENT topics) — log-free, exact in integer ppm.
  Reuses the shared k-means assignment (operators/similarity.py), so
  cluster structure is computed once per session, and embeddings pair
  with documents via vec_id = doc_id (FIXTURES.md).

Determinism: counts are integers end-to-end; profile shares and TVD in
integer ppm via wide-integer div (Spark DECIMAL(38,0) == DuckDB
HUGEINT; TVD doubles the half-sum instead of halving, keeping every
intermediate an integer); top-k vocabulary breaks ties on the word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

DRIFT_VOCAB = 100


# -- x_vocab_drift: pairwise source unigram TVD --------------------------------

def x_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance (ppm) between each source pair's unigram
    distribution over the corpus-wide top-`DRIFT_VOCAB` words (plus an
    OTHER bucket for the tail, so profiles are true distributions).
    High TVD pairs = genuinely different text populations; near-zero =
    redundant sources.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    # ONE tokenize pass: aggregate straight to (source, word) counts
    # (map-side partial aggregation — guide §2.3) and derive BOTH the
    # corpus-wide top-vocab and the per-source profiles from that table;
    # the previous form re-ran the corpus explode for the bucketing pass
    # (r07 work profile: 19 jobs). Lazily pinned — two consumers.
    sw = (
        words.groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    counts = sw.groupBy("word").agg(F.sum("c").cast("long").alias("cnt"))
    top = (
        counts.orderBy(F.desc("cnt"), "word")
        .limit(DRIFT_VOCAB)
        .select("word")
    )
    bucketed = sw.join(
        F.broadcast(top.select(F.col("word").alias("w"), F.lit(1).alias("hit"))),
        sw.word == F.col("w"),
        "left",
    ).select(
        "source",
        F.when(F.col("hit").isNotNull(), F.col("word"))
        .otherwise(F.lit("\x00OTHER"))
        .alias("word"),
        "c",
    )
    prof = bucketed.groupBy("source", "word").agg(
        F.sum("c").cast("long").alias("c")
    )
    tot = prof.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    shares = prof.join(F.broadcast(tot), "source").select(
        "source",
        "word",
        F.expr(
            "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("ppm"),
    )
    a = shares.select(
        F.col("source").alias("source_a"),
        "word",
        F.col("ppm").alias("pa"),
    )
    b = shares.select(
        F.col("source").alias("source_b"),
        "word",
        F.col("ppm").alias("pb"),
    )
    return (
        a.join(b, "word", "full")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            (
                F.sum(
                    F.abs(
                        F.coalesce("pa", F.lit(0)) - F.coalesce("pb", F.lit(0))
                    )
                )
                / 2
            )
            .cast("long")
            .alias("tvd_ppm")
        )
        .orderBy(F.desc("tvd_ppm"), "source_a", "source_b")
        .limit(20)
    )


X_VOCAB_DRIFT_SQL = rf"""
WITH words AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS word
  FROM documents
),
counts AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
top AS (SELECT word FROM counts ORDER BY cnt DESC, word LIMIT {DRIFT_VOCAB}),
bucketed AS (
  SELECT w.source,
         CASE WHEN t.word IS NOT NULL THEN w.word
              ELSE chr(0) || 'OTHER' END AS word
  FROM words w LEFT JOIN top t ON t.word = w.word
),
prof AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
  FROM bucketed GROUP BY source, word
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM prof GROUP BY source),
shares AS (
  SELECT p.source, p.word,
         CAST(CAST(p.c AS HUGEINT) * 1000000 // t.n AS BIGINT) AS ppm
  FROM prof p JOIN tot t USING (source)
)
SELECT a.source_a, b.source_b,
       CAST(SUM(ABS(COALESCE(a.pa, 0) - COALESCE(b.pb, 0))) // 2 AS BIGINT)
         AS tvd_ppm
FROM (SELECT source AS source_a, word, ppm AS pa FROM shares) a
FULL JOIN (SELECT source AS source_b, word, ppm AS pb FROM shares) b
  USING (word)
WHERE a.source_a < b.source_b
GROUP BY a.source_a, b.source_b
ORDER BY tvd_ppm DESC, a.source_a, b.source_b
LIMIT 20
"""


# -- x_topic_diversity: Simpson index per source over k-means topics ----------

def x_topic_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity per source over k-means topic cells: the
    probability (ppm) that two random documents from the source belong
    to DIFFERENT topics — 0 = single-topic source, high = broad mix.
    Joins the shared k-means assignment to documents on vec_id = doc_id.
    """
    from kinbaku_spark.queries import kmeans_state

    docs = load_table(spark, sf_dir, "documents")
    assigned = kmeans_state.assignment(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "cluster"
    )
    cells = (
        docs.select("doc_id", "source")
        .join(assigned, "doc_id")
        .groupBy("source", "cluster")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    return (
        cells.groupBy("source")
        .agg(
            F.sum("nc").cast("long").alias("n_docs"),
            F.sum(F.expr("nc * (nc - 1)")).cast("long").alias("same_pairs"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "source",
            "n_docs",
            F.expr(
                "1000000 - CAST(CAST(same_pairs AS DECIMAL(38,0)) * 1000000"
                " div (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1))"
                " AS BIGINT)"
            ).alias("simpson_ppm"),
        )
        .orderBy("source")
    )


def _topic_diversity_sql() -> str:
    from kinbaku_spark.queries.pipeline_ext2 import kmeans_assign_cte

    return (
        kmeans_assign_cte()
        + """,
cells AS (
  SELECT d.source, a.cluster, CAST(COUNT(*) AS BIGINT) AS nc
  FROM documents d JOIN a2 a ON a.vec_id = d.doc_id
  GROUP BY d.source, a.cluster
)
SELECT source, CAST(SUM(nc) AS BIGINT) AS n_docs,
       1000000 - CAST(CAST(SUM(nc * (nc - 1)) AS HUGEINT) * 1000000
                      // (CAST(SUM(nc) AS HUGEINT) * (SUM(nc) - 1))
                      AS BIGINT) AS simpson_ppm
FROM cells
GROUP BY source
HAVING SUM(nc) >= 2
ORDER BY source
"""
    )


QUERIES["x_vocab_drift"] = x_vocab_drift
ORACLES["x_vocab_drift"] = X_VOCAB_DRIFT_SQL
QUERIES["x_topic_diversity"] = x_topic_diversity
ORACLES["x_topic_diversity"] = _topic_diversity_sql()
