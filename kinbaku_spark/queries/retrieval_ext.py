"""Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
dense (cosine ANN) legs.

The reference (kerighan/kinbaku) has no retrieval surface (SURVEY.md
§2.4); this completes the engine's RAG family (x_bm25_topk,
x_ann_cosine_topk, x_inverted_index, x_chunk_documents) with the standard
way the two rankings are combined in production retrieval: RRF
(Cormack et al. 2009), score(d) = Σ_legs 1/(K + rank_leg(d)), K = 60.

Shuffle shapes (the 100 TB story): both legs are existing top-k queries
(TakeOrderedAndProject — k-bounded, no global sort of the corpus); fusion
itself runs over 2·k rows, so the rank windows and the full-outer join
are constant-size no matter the corpus. At scale the legs' candidate
generation is the cost; fusion is free.

Determinism: 1/(K + r) becomes the exact integer 10⁶ div (K + r); ranks
come from row_number over (rounded score DESC, doc_id) — total orders on
both engines; absent legs contribute rank 0 / score 0 (never NULL, so
value hashes can't drift on null encoding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

QUERIES: dict = {}
ORACLES: dict = {}

RRF_K = 60
RRF_TOP_K = 10


def x_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by reciprocal-rank fusion of the BM25 top-k and
    the cosine top-k (embeddings.vec_id is the document id in this
    corpus). lex_rank / dense_rank are 1-based positions in each leg,
    0 when the doc is absent from that leg.
    """
    from kinbaku_spark.queries.extensions import x_ann_cosine_topk
    from kinbaku_spark.queries.mining_ext import x_bm25_topk

    wl = Window.orderBy(F.desc("bm25"), "doc_id")
    lex = x_bm25_topk(spark, sf_dir).select(
        "doc_id", F.row_number().over(wl).alias("rl")
    )
    wd = Window.orderBy(F.desc("sim"), "doc_id")
    den = (
        x_ann_cosine_topk(spark, sf_dir)
        .withColumnRenamed("vec_id", "doc_id")
        .select("doc_id", F.row_number().over(wd).alias("rd"))
    )
    return (
        lex.join(den, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("rl"), F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce(F.col("rd"), F.lit(0)).cast("int").alias("dense_rank"),
            (
                F.coalesce(F.expr(f"1000000 div ({RRF_K} + rl)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000 div ({RRF_K} + rd)"), F.lit(0))
            ).cast("long").alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOP_K)
    )


def _rrf_sql() -> str:
    from kinbaku_spark.queries.extensions import X_ANN_COSINE_SQL
    from kinbaku_spark.queries.mining_ext import _bm25_sql

    return f"""
WITH lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rl
  FROM ({_bm25_sql()})
),
den AS (
  SELECT vec_id AS doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rd
  FROM ({X_ANN_COSINE_SQL})
)
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
       CAST(COALESCE(l.rl, 0) AS INTEGER) AS lex_rank,
       CAST(COALESCE(d.rd, 0) AS INTEGER) AS dense_rank,
       CAST(COALESCE(1000000 // ({RRF_K} + l.rl), 0)
            + COALESCE(1000000 // ({RRF_K} + d.rd), 0) AS BIGINT) AS rrf_score
FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT {RRF_TOP_K}
"""


QUERIES["x_rrf_fusion"] = x_rrf_fusion
ORACLES["x_rrf_fusion"] = _rrf_sql()
