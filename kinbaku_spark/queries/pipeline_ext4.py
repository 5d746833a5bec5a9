"""Exact-substring window dedup, DSIR-style importance weights, and
tokenizer-sizing statistics.

The reference (kerighan/kinbaku) has no text-pipeline surface (SURVEY.md
§2.4); these extend the LLM-training-data family with three published
curation shapes:

- window dedup: the exact-substring duplication scan of Lee et al. 2022
  ("Deduplicating Training Data Makes Language Models Better") — two
  documents sharing any W-word window are duplication candidates; unlike
  MinHash it has no probabilistic miss, unlike full suffix-array
  construction it is expressible as hash postings.
- DSIR weights: Xie et al. 2023 ("Data Selection for Language Models via
  Importance Resampling") — score every document by how target-like its
  hashed-unigram profile is, here with an exact rational weight (the
  arithmetic mean of per-token target-share) instead of a log-likelihood
  ratio so both engines replay it bit-identically.
- tokenizer stats: per-language type/token ratio and subword fertility
  under a fixed 4-char-piece tokenizer proxy — the corpus statistics that
  size a tokenizer's vocab and per-language compression before training.

Shuffle shapes (the 100 TB story):

- window dedup: ONE explode builds the window-hash postings; a document
  -frequency profile (groupBy h) caps the postings BEFORE the self-join —
  windows with df > WINDOW_DF_CAP are boilerplate (licence headers,
  navigation chrome) and are dropped, so no hot window can produce a
  quadratic bucket (the x_dedup_containment lesson, VERDICT r01 §wrong-4);
  the surviving postings join is bounded by df ≤ cap ⇒ ≤ cap·|postings|
  candidate rows.
- DSIR: the bucket profile is O(N_BUCKETS) rows (1024) — broadcast back
  onto the token stream; per-doc masses collapse map-side into one
  groupBy(doc_id). No self-joins anywhere; the whole query is two scans
  of the token explode (checkpointed once).
- tokenizer stats: one explode + one groupBy(lang) — rides the scan.

Determinism: counts are exact integers; weights/ratios are integer ppm
via truncating div; the DSIR top-100 orders by (weight_ppm DESC, doc_id)
— a total order. Window hashes reuse the proven 60-bit md5 idiom
(functions/hashing.py) so DuckDB replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.operators.dedup import shingle_hashes
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_window_dedup: exact W-word-window duplication scan --------------------

WINDOW_W = 8          # words per window (Lee et al. use 50 BPE tokens;
                      # 8 words ≈ the same order on this corpus's ~60-word docs)
WINDOW_DF_CAP = 16    # windows seen in more docs are boilerplate, not dup signal


def x_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥1 exact 8-word window, with the count of
    distinct shared windows — the exact-substring dup scan. Postings are
    document-frequency-capped before the self-join so a hot boilerplate
    window can never create a quadratic candidate bucket.
    """
    docs = load_table(spark, sf_dir, "documents")
    # two consumers (df profile, postings): checkpoint the explode once.
    # Lazy: every consumer resolves inside the one final action, so the
    # blocks still materialize exactly once — without the serial
    # construction-time jobs the eager form ran (r07 work profile)
    sh = shingle_hashes(docs, "doc_id", "text", WINDOW_W).localCheckpoint(eager=False)
    keep = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter((F.col("c") >= 2) & (F.col("c") <= WINDOW_DF_CAP))
        .select("h")
    )
    # self-joined twice: pin the capped postings so the filter-join runs once
    post = sh.join(keep, "h", "left_semi").localCheckpoint(eager=False)
    a = post.select(F.col("doc_id").alias("doc_id_a"), "h")
    b = post.select(F.col("doc_id").alias("doc_id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .orderBy("doc_id_a", "doc_id_b")
    )


def _window_dedup_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_shingle_cte

    return f"""
WITH {_sql_shingle_cte(WINDOW_W)},
df AS (SELECT h, COUNT(*) AS c FROM hx GROUP BY h),
keep AS (SELECT h FROM df WHERE c BETWEEN 2 AND {WINDOW_DF_CAP}),
post AS MATERIALIZED (SELECT hx.doc_id, hx.h FROM hx JOIN keep USING (h))
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(COUNT(*) AS BIGINT) AS shared_windows
FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# -- x_dsir_weights: hashed-unigram importance weights (target = English) ----

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"
DSIR_TOP_K = 100


def _words_exploded(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, t): one row per token occurrence (whitespace split,
    empties dropped) — occurrences, not distinct types: DSIR masses are
    frequency-weighted."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id", "lang", F.explode(F.filter(words, lambda x: x != "")).alias("t")
    )


def x_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 most target-like documents under a DSIR-style hashed-unigram
    importance weight. Target distribution = the English sub-corpus; weight
    = 10⁶ · Σ_t n_target(bucket(t)) div Σ_t n_raw(bucket(t)) — the exact
    rational analogue of the unigram likelihood ratio (arithmetic instead
    of geometric mean, so no floating log leaves the JVM).
    """
    docs = load_table(spark, sf_dir, "documents")
    # two consumers (bucket profile, per-doc masses): pin the explode once
    # lazy: both consumers resolve inside the one final action
    b = (
        _words_exploded(docs)
        .select("doc_id", "lang", (md5_long(F.col("t")) % DSIR_BUCKETS).alias("bkt"))
        .localCheckpoint(eager=False)
    )
    prof = b.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.lit(1)).otherwise(F.lit(0))
        ).alias("tgt_n"),
    )
    return (
        b.join(F.broadcast(prof), "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tgt_n").alias("tgt_mass"),
            F.sum("raw_n").alias("raw_mass"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("tgt_mass * 1000000 div raw_mass").alias("weight_ppm"),
        )
        .orderBy(F.desc("weight_ppm"), "doc_id")
        .limit(DSIR_TOP_K)
    )


X_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS t
  FROM documents
),
b AS MATERIALIZED (
  SELECT doc_id, lang, {sql_md5_long('t')} % {DSIR_BUCKETS} AS bkt FROM tok
),
prof AS (
  SELECT bkt,
         CAST(COUNT(*) AS BIGINT) AS raw_n,
         CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS tgt_n
  FROM b GROUP BY 1
),
mass AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(p.tgt_n) AS BIGINT) AS tgt_mass,
         CAST(SUM(p.raw_n) AS BIGINT) AS raw_mass
  FROM b JOIN prof p USING (bkt)
  GROUP BY 1
)
SELECT doc_id, n_tokens,
       CAST(tgt_mass * 1000000 // raw_mass AS BIGINT) AS weight_ppm
FROM mass
ORDER BY weight_ppm DESC, doc_id
LIMIT {DSIR_TOP_K}
"""


# -- x_tokenizer_fertility: per-language tokenizer-sizing statistics ---------

FERTILITY_PIECE_LEN = 4  # fixed max-piece length of the subword proxy


def x_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language type/token ratio and subword fertility under a fixed
    4-char-piece tokenizer proxy (a word of length L costs ⌈L/4⌉ pieces).
    The two numbers that size a tokenizer's vocab and per-language
    compression rate before training.
    """
    docs = load_table(spark, sf_dir, "documents")
    p = FERTILITY_PIECE_LEN
    tok = _words_exploded(docs)
    return (
        tok.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.countDistinct(F.lower(F.col("t"))).alias("vocab"),
            F.sum(F.expr(f"(length(t) + {p - 1}) div {p}")).alias("pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "vocab",
            F.expr("vocab * 1000000 div n_words").alias("ttr_ppm"),
            F.expr("pieces * 1000000 div n_words").alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


X_TOKENIZER_FERTILITY_SQL = f"""
WITH tok AS (
  SELECT lang, doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS t
  FROM documents
),
agg AS (
  SELECT lang,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT lower(t)) AS BIGINT) AS vocab,
         CAST(SUM((length(t) + {FERTILITY_PIECE_LEN - 1})
                  // {FERTILITY_PIECE_LEN}) AS BIGINT) AS pieces
  FROM tok GROUP BY lang
)
SELECT lang, n_docs, n_words, vocab,
       CAST(vocab * 1000000 // n_words AS BIGINT) AS ttr_ppm,
       CAST(pieces * 1000000 // n_words AS BIGINT) AS fertility_ppm
FROM agg
ORDER BY lang
"""


# -- x_vocab_growth: Heaps'-law vocabulary growth curve -----------------------

VOCAB_DECILES = 10


def x_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: cumulative distinct vocabulary after each tenth
    of the corpus (by doc_id order) — the growth curve that predicts how
    much NEW vocabulary another 10× of data buys, sizing tokenizer vocab
    and OOV budgets before training.

    One explode + one groupBy(word) computes each word's FIRST document;
    the curve is a 10-row cumulative sum over the first-seen buckets —
    the corpus is never scanned per decile.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    tok = docs.select(
        "doc_id", F.explode(F.filter(words, lambda x: x != "")).alias("t")
    )
    mx = docs.agg(F.max("doc_id").alias("mx"))
    first = (
        tok.groupBy(F.lower(F.col("t")).alias("w"))
        .agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(mx))
        # decile 1..10 by first-seen doc position (exact integer bounds)
        .select(
            F.expr(
                f"least({VOCAB_DECILES}, first_doc * {VOCAB_DECILES}"
                f" div (mx + 1) + 1)"
            ).alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        first.select(
            F.col("decile").cast("int").alias("decile"),
            "new_words",
            F.sum("new_words").over(w).cast("long").alias("cum_vocab"),
        )
        .orderBy("decile")
    )


X_VOCAB_GROWTH_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS t
  FROM documents
),
mx AS (SELECT MAX(doc_id) AS mx FROM documents),
first AS (
  SELECT lower(t) AS w, MIN(doc_id) AS first_doc FROM tok GROUP BY 1
),
bucketed AS (
  SELECT LEAST({VOCAB_DECILES}, first_doc * {VOCAB_DECILES} // (mx.mx + 1) + 1)
           AS decile
  FROM first CROSS JOIN mx
),
agg AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_words
  FROM bucketed GROUP BY decile
)
SELECT CAST(decile AS INTEGER) AS decile, new_words,
       CAST(SUM(new_words) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM agg
ORDER BY decile
"""


# -- x_zipf_check: rank-frequency law audit -----------------------------------

ZIPF_TOP_K = 100


def x_zipf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 words by frequency with their rank·frequency product — the
    Zipf audit (r·f ≈ const for natural text; a flat or erratic product
    flags synthetic/templated corpora). One explode + one groupBy(word) +
    a k-bounded top-k; the rank window runs over 100 rows.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    freq = (
        docs.select(F.explode(F.filter(words, lambda x: x != "")).alias("t"))
        .groupBy(F.lower(F.col("t")).alias("w"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(ZIPF_TOP_K)
    )
    rk = Window.orderBy(F.desc("freq"), "w")
    return freq.select(
        F.row_number().over(rk).alias("rank"),
        "w",
        "freq",
        (F.row_number().over(rk) * F.col("freq")).cast("long").alias("rf"),
    ).orderBy("rank")


X_ZIPF_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                            x -> x <> '')) AS t
  FROM documents
),
freq AS (
  SELECT lower(t) AS w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok GROUP BY 1
  ORDER BY freq DESC, w LIMIT {ZIPF_TOP_K}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS INTEGER) AS rank,
       w, freq,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w) * freq AS BIGINT) AS rf
FROM freq
ORDER BY rank
"""


QUERIES["x_window_dedup"] = x_window_dedup
ORACLES["x_window_dedup"] = _window_dedup_sql()
QUERIES["x_vocab_growth"] = x_vocab_growth
ORACLES["x_vocab_growth"] = X_VOCAB_GROWTH_SQL
QUERIES["x_zipf_check"] = x_zipf_check
ORACLES["x_zipf_check"] = X_ZIPF_SQL
QUERIES["x_dsir_weights"] = x_dsir_weights
ORACLES["x_dsir_weights"] = X_DSIR_SQL
QUERIES["x_tokenizer_fertility"] = x_tokenizer_fertility
ORACLES["x_tokenizer_fertility"] = X_TOKENIZER_FERTILITY_SQL
