"""UDF/UDTF surface queries: the Arrow pandas_udf and the Python UDTF from
``functions.udfs`` driven end-to-end, with exact DuckDB replays (integer and
string outputs only — no float drift possible).

The reference's UDF story is a pluggable hash function and dataclass
schemas (SURVEY.md §2.4); this is the Spark-native equivalent surface.
"""

from __future__ import annotations

from kinbaku_spark.functions.udfs import make_ws_token_count, register_udfs
from kinbaku_spark.sources.tables import load_table, register_views


def x_udf_token_count(spark, sf_dir):
    """Arrow-vectorized pandas UDF over the corpus (batch transfer, one
    Python invocation per Arrow batch — the only acceptable Python-UDF
    shape at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", make_ws_token_count()("text").alias("n_ws_tokens")
    ).orderBy("doc_id")


X_UDF_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(CASE WHEN text IS NULL THEN 0
            ELSE len(list_filter(string_split_regex(text, '\s+'), p -> p <> ''))
       END AS INTEGER) AS n_ws_tokens
FROM documents
ORDER BY doc_id
"""


def x_udtf_sentences(spark, sf_dir):
    """Python UDTF via LATERAL correlation in SQL: 1->N row generation with
    per-document state (the sentence index)."""
    register_udfs(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence, s.n_tokens
        FROM documents d, LATERAL sentence_split(d.doc_id, d.text) s
        ORDER BY doc_id, sent_idx
        """
    )


X_UDTF_SENTENCES_SQL = r"""
WITH parts AS (
  SELECT doc_id, generate_subscripts(p, 1) AS i, unnest(p) AS raw
  FROM (SELECT doc_id, string_split(text, '.') AS p FROM documents)
),
sent AS (
  SELECT doc_id, i, trim(raw, ' ' || chr(9) || chr(10) || chr(13)) AS sentence
  FROM parts
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INTEGER) AS sent_idx,
       sentence,
       CAST(len(list_filter(string_split_regex(sentence, '\s+'), p -> p <> '')) AS INTEGER) AS n_tokens
FROM sent
WHERE sentence <> ''
ORDER BY doc_id, sent_idx
"""


QUERIES = {
    "x_udf_token_count": x_udf_token_count,
    "x_udtf_sentences": x_udtf_sentences,
}
ORACLES = {
    "x_udf_token_count": X_UDF_TOKEN_COUNT_SQL,
    "x_udtf_sentences": X_UDTF_SENTENCES_SQL,
}


def x_ann_pandas_topk(spark, sf_dir):
    """Brute-force cosine top-k with the arithmetic inside a vectorized
    Arrow kernel (mapInPandas + numpy) instead of JVM expressions — the
    Pandas-UDF scale path for vector math the built-ins can't express
    (learned kernels, quantized dot products, re-rankers).

    Bit-for-bit identical to the SQL fold: the kernel accumulates the dot
    product and norms SEQUENTIALLY over dimensions (vectorized across
    ROWS), i.e. the same left-to-right double additions as F.aggregate /
    list_reduce — so the shared oracle of x_ann_cosine_topk verifies this
    kernel exactly, proving the Arrow path preserves numerics. Rounding
    and the top-k cut stay JVM-side (round + TakeOrderedAndProject).
    """
    import math

    from pyspark.sql import functions as F

    from kinbaku_spark.queries.extensions import ANN_K, _empty_topk, _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    if qv is None:  # empty corpus: same empty result as the oracle
        return _empty_topk(emb)
    q = [float(v) for v in qv]
    nq = 0.0
    for v in q:
        nq += v * v
    nq = math.sqrt(nq)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy())  # (n, d) float32
            n = mat.shape[0]
            acc = np.zeros(n, dtype=np.float64)
            na = np.zeros(n, dtype=np.float64)
            for d in range(mat.shape[1]):  # sequential over dims,
                x = mat[:, d].astype(np.float64)  # vectorized over rows
                acc = acc + x * q[d]
                na = na + x * x
            sim = acc / (np.sqrt(na) * nq)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "sim": sim})

    scored = emb.filter(F.col("vec_id") != 0).mapInPandas(
        kernel, "vec_id bigint, sim double"
    )
    return (
        scored.select("vec_id", F.round("sim", 6).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(ANN_K)
    )


def _ann_pandas_sql() -> str:
    from kinbaku_spark.queries.extensions import X_ANN_COSINE_SQL

    return X_ANN_COSINE_SQL  # the SAME oracle as the JVM-expression path


QUERIES["x_ann_pandas_topk"] = x_ann_pandas_topk
ORACLES["x_ann_pandas_topk"] = _ann_pandas_sql()
