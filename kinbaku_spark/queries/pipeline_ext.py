"""Training-data plumbing queries, wave 2: deterministic stratified
sampling + splits, sequence packing (token-budget chunking), and benchmark
contamination detection. Thin adapters over operators/pipeline.py with
exact DuckDB replays (shared md5-derived 60-bit hash, integer window math).
"""

from __future__ import annotations

from kinbaku_spark.functions.hashing import sql_md5_long
from kinbaku_spark.functions.textfns import SQL_WORDS, sql_shingle_array
from kinbaku_spark.operators.pipeline import (
    cross_split_contamination,
    pack_sequences,
    stratified_sample,
)
from kinbaku_spark.operators.text import TOKEN_PATTERN
from kinbaku_spark.sources.tables import load_table

SAMPLE_RATES = {"en": 0.2}
SAMPLE_DEFAULT = 0.6
PACK_CAPACITY = 512
TRAIN_SOURCES = [f"src{i}" for i in range(10)]
EVAL_SOURCES = [f"src{i}" for i in range(10, 20)]


# -- deterministic stratified sample + split ----------------------------------

def x_sample_stratified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, rates=SAMPLE_RATES, default_rate=SAMPLE_DEFAULT)


X_SAMPLE_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
    {sql_md5_long("CAST(doc_id AS VARCHAR)")} % 1000 AS bucket,
    {sql_md5_long("CAST(doc_id AS VARCHAR) || ':split'")} % 10 AS sb
  FROM documents
)
SELECT doc_id, lang, bucket,
  CASE WHEN sb < 8 THEN 'train' WHEN sb < 9 THEN 'val' ELSE 'test' END AS split
FROM s
WHERE bucket < CASE WHEN lang = 'en' THEN 200 ELSE 600 END
"""


# -- sequence packing (token-budget chunking) ---------------------------------

def x_seq_packing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, capacity=PACK_CAPACITY)


X_SEQ_PACKING_SQL = f"""
WITH t AS (
  SELECT source, doc_id,
         len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS tok
  FROM documents
), c AS (
  SELECT source, tok,
    CAST(FLOOR(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_CAPACITY}) AS BIGINT)
      AS chunk_id
  FROM t
)
SELECT source, chunk_id, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS sum_tokens
FROM c
GROUP BY source, chunk_id
ORDER BY source, chunk_id
"""


# -- benchmark contamination (8-gram inverted-index join) ---------------------

def x_contamination(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return cross_split_contamination(
        docs, train_sources=TRAIN_SOURCES, eval_sources=EVAL_SOURCES
    )


_TRAIN_IN = ", ".join(f"'{s}'" for s in TRAIN_SOURCES)
_EVAL_IN = ", ".join(f"'{s}'" for s in EVAL_SOURCES)

X_CONTAMINATION_SQL = f"""
WITH w AS (
  SELECT doc_id, source, {SQL_WORDS.format(expr="text")} AS words FROM documents
),
sh AS (
  SELECT doc_id, source, unnest({sql_shingle_array("words", 8)}) AS s FROM w
),
hx AS (
  SELECT doc_id, source, {sql_md5_long("s")} AS h FROM sh
),
tr AS (SELECT doc_id, h FROM hx WHERE source IN ({_TRAIN_IN})),
ev AS (SELECT doc_id AS eval_doc_id, h FROM hx WHERE source IN ({_EVAL_IN}))
SELECT tr.doc_id,
       COUNT(DISTINCT ev.eval_doc_id) AS n_eval_docs,
       COUNT(DISTINCT tr.h) AS n_shared_grams
FROM tr JOIN ev ON ev.h = tr.h
GROUP BY tr.doc_id
ORDER BY tr.doc_id
"""


QUERIES = {
    "x_sample_stratified": x_sample_stratified,
    "x_seq_packing": x_seq_packing,
    "x_contamination": x_contamination,
}

ORACLES = {
    "x_sample_stratified": X_SAMPLE_SQL,
    "x_seq_packing": X_SEQ_PACKING_SQL,
    "x_contamination": X_CONTAMINATION_SQL,
}
