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
    weighted_sample,
)
from pyspark.sql import functions as F
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


# -- deterministic weighted sample (Efraimidis-Spirakis top-k) ----------------

WSAMPLE_K = 20


def x_weighted_sample(spark, sf_dir):
    """Length-weighted document sample: longer docs proportionally more
    likely, yet the draw is a pure function of doc_id (see
    operators/pipeline.py weighted_sample for the scale analysis)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "weight", (F.col("n_chars") + F.lit(1)).cast("long")
    )
    return weighted_sample(docs, k=WSAMPLE_K, weight_col="weight")


X_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars + 1 AS BIGINT) AS weight,
         ln(CAST({sql_md5_long("CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
            / CAST('{1 << 60}' AS DOUBLE))
         / CAST(n_chars + 1 AS DOUBLE) AS k
  FROM documents
), top AS (
  SELECT doc_id, weight FROM keyed ORDER BY k DESC, doc_id LIMIT {WSAMPLE_K}
)
SELECT doc_id, weight FROM top ORDER BY doc_id
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
    "x_weighted_sample": x_weighted_sample,
    "x_seq_packing": x_seq_packing,
    "x_contamination": x_contamination,
}

ORACLES = {
    "x_sample_stratified": X_SAMPLE_SQL,
    "x_weighted_sample": X_WEIGHTED_SAMPLE_SQL,
    "x_seq_packing": X_SEQ_PACKING_SQL,
    "x_contamination": X_CONTAMINATION_SQL,
}


# -- multimodal plumbing, oracle-checked ------------------------------------
# The fake decoders are pure functions of the payload BYTES, so DuckDB can
# replay them exactly (hex() + per-byte arithmetic): the mapInPandas
# plumbing gets a full value-hash check, not just rows-only. (The image
# variant stays rows-only: its aspect ratio can land on exact 6dp rounding
# ties, e.g. odd/128.)

VIDEO_EVERY_MS = 200


def x_multimodal_audio(spark, sf_dir):
    from kinbaku_spark.operators.multimodal import audio_features, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return audio_features(with_binary_payload(docs), fake=True)


X_MULTIMODAL_AUDIO_SQL = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id,
  CAST(n AS INT) AS n_bytes,
  CAST(CASE n % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050 ELSE 44100 END AS INT)
    AS sample_rate,
  CAST(n * 4 AS INT) AS n_frames,
  ROUND(CAST(n * 4 AS DOUBLE)
        / CASE n % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050 ELSE 44100 END, 6)
    AS duration_s
FROM b
"""


def x_multimodal_video(spark, sf_dir):
    from kinbaku_spark.operators.multimodal import (
        video_frame_samples,
        with_binary_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    return video_frame_samples(with_binary_payload(docs), every_ms=VIDEO_EVERY_MS)


X_MULTIMODAL_VIDEO_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
), f AS (
  SELECT doc_id, hx, n,
         GREATEST(1, (n * 3) // {VIDEO_EVERY_MS}) AS n_frames,
         n // GREATEST(1, (n * 3) // {VIDEO_EVERY_MS}) AS frame_len
  FROM b
), fr AS (
  SELECT doc_id, hx, n, n_frames, frame_len,
         unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT))) AS k
  FROM f
)
SELECT doc_id,
  CAST(k AS INT) AS frame_idx,
  CAST(k * {VIDEO_EVERY_MS} AS BIGINT) AS ts_ms,
  CAST((CASE WHEN k = n_frames - 1 THEN n ELSE (k + 1) * frame_len END)
       - k * frame_len AS INT) AS frame_bytes,
  CAST(list_aggregate(list_transform(
      generate_series(CAST(k * frame_len + 1 AS BIGINT),
                      CAST(CASE WHEN k = n_frames - 1 THEN n
                                ELSE (k + 1) * frame_len END AS BIGINT)),
      i -> CAST(('0x' || substr(hx, CAST(2 * i - 1 AS INT), 2)) AS BIGINT)),
    'sum') AS BIGINT) AS frame_checksum
FROM fr
"""


QUERIES.update(
    {
        "x_multimodal_audio": x_multimodal_audio,
        "x_multimodal_video": x_multimodal_video,
    }
)
ORACLES.update(
    {
        "x_multimodal_audio": X_MULTIMODAL_AUDIO_SQL,
        "x_multimodal_video": X_MULTIMODAL_VIDEO_SQL,
    }
)


# -- one-pass table profiling -------------------------------------------------

PROFILE_NUM_COLS = ["l_discount", "l_extendedprice", "l_quantity"]
PROFILE_STR_COLS = ["l_linestatus", "l_returnflag"]


def x_profile_lineitem(spark, sf_dir):
    from kinbaku_spark.operators.pipeline import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(li, PROFILE_NUM_COLS, PROFILE_STR_COLS)


def _profile_sql() -> str:
    aggs = ["COUNT(*) AS n_rows"]
    for c in PROFILE_NUM_COLS + PROFILE_STR_COLS:
        aggs += [
            f"COUNT({c}) AS nn_{c}",
            f"COUNT(DISTINCT {c}) AS nd_{c}",
            f"MIN({c}) AS mn_{c}",
            f"MAX({c}) AS mx_{c}",
        ]
    rows = []
    for c in PROFILE_NUM_COLS:
        rows.append(
            f"SELECT '{c}' AS col, n_rows, CAST(nn_{c} AS BIGINT) AS n_nonnull,"
            f" CAST(nd_{c} AS BIGINT) AS n_distinct,"
            f" CAST(mn_{c} AS DOUBLE) AS min_num, CAST(mx_{c} AS DOUBLE) AS max_num,"
            f" CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a"
        )
    for c in PROFILE_STR_COLS:
        rows.append(
            f"SELECT '{c}' AS col, n_rows, CAST(nn_{c} AS BIGINT) AS n_nonnull,"
            f" CAST(nd_{c} AS BIGINT) AS n_distinct,"
            f" CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,"
            f" CAST(mn_{c} AS VARCHAR) AS min_str, CAST(mx_{c} AS VARCHAR) AS max_str FROM a"
        )
    body = "\nUNION ALL\n".join(rows)
    return f"WITH a AS (SELECT {', '.join(aggs)} FROM lineitem)\n{body}\nORDER BY col"


QUERIES["x_profile_lineitem"] = x_profile_lineitem
ORACLES["x_profile_lineitem"] = _profile_sql()
