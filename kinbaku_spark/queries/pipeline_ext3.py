"""Training-data pipeline operators, batch 3: source-mixture temperature
weighting (the data-mixing step of LLM pretraining), SemDeDup-style
semantic deduplication over the embedding corpus, and CCNet-style
quality-tercile resampling.

The reference (kerighan/kinbaku) has no text/vector surface at all
(SURVEY.md §2.4); these extend the LLM-data-curation surface on the
driver's `documents` / `embeddings` tables.

Shuffle shapes (the 100 TB story):

- mixture weights: ONE groupBy(source) with map-side partials collapses
  the corpus to a per-source row; everything after (sqrt temperature,
  normalization) runs on the tiny aggregate via a single-partition window
  — sources are O(100) even at 100 TB.
- semantic dedup: the pair space is within-cluster only (equi-join on the
  k-means cluster id, Σ|c|² not O(n²)); the cluster assignment is the
  zero-shuffle literal-broadcast k-means pass (operators/similarity.py).
- quality resample: one scan computes integer-ppm feature scores
  (shuffle-free projection); the tercile NTILE is one global sort of
  (score, doc_id) — at 100 TB swap for approx quantile cutpoints and keep
  the same bucket rule; the keep-decision is a deterministic hash, never
  engine RNG.

Determinism: all scores are exact BIGINT ppm (integer div, no
double-rounding hazards); sqrt is IEEE-correctly-rounded on integer inputs
in both engines and is immediately quantized to integer micro-units before
any summation; pair sims round to 6dp before thresholding (the proven
x_dedup_embedding pattern); middle-bucket sampling keys on the shared
60-bit md5 hash (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.operators.rank import with_ntile
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_mixture_weights: temperature-sampled source mixing --------------------
# w_s ∝ sqrt(tokens_s)  (alpha = 0.5), reported in exact integer ppm.

def x_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for corpus mixing: natural token share
    vs temperature-flattened share (alpha=0.5 — the multilingual/domain
    rebalancing rule of mBERT/XLM-R and data-mixture tuning).

    sqrt(tokens) is quantized to integer micro-units BEFORE the
    normalizing sum, so both engines sum exact BIGINTs (order-free) and
    divide with integer `div` — bit-equal ppm outputs.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )
    q = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000.0).cast("long")
    w = Window.partitionBy()
    return (
        per_src.withColumn("q", q)
        .withColumn("tot_q", F.sum("q").over(w))
        .withColumn("tot_tokens", F.sum("n_tokens").over(w))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("n_tokens * 1000000 div tot_tokens").alias("natural_ppm"),
            F.expr("q * 1000000 div tot_q").alias("weight_ppm"),
        )
        .orderBy("source")
    )


X_MIXTURE_WEIGHTS_SQL = r"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
qq AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS q
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST((n_tokens * 1000000) // (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM qq) AS BIGINT) AS natural_ppm,
       CAST((q * 1000000) // (SELECT CAST(SUM(q) AS BIGINT) FROM qq) AS BIGINT) AS weight_ppm
FROM qq
ORDER BY source
"""


# -- x_semantic_dedup: SemDeDup within-k-means-cluster near-dup removal ------

SEMDEDUP_THRESHOLD = 0.4  # rendered as a bare literal in SQL, matching
# x_dedup_embedding's proven rounded-6dp comparison

# Cell-size cap (VERDICT r02 #3): with fixed k, cell size grows linearly
# with the corpus and within-cell pair work quadratically (the 10x drill
# measured 4.2x time at 10x rows uncapped). Oversized cells are split into
# ceil(sz/cap) deterministic md5 sub-buckets — bounding every join group at
# ~cap² pairs — and the oracle replays the identical md5 rule, so the
# (documented) cross-sub-bucket recall loss is engine-independent.
SEMDEDUP_MAX_CELL = 50


def x_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinbaku_spark.operators.similarity import semantic_dedup
    from kinbaku_spark.queries import kmeans_state

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb,
        threshold=SEMDEDUP_THRESHOLD,
        max_cluster_size=SEMDEDUP_MAX_CELL,
        assigned=kmeans_state.assignment(spark, sf_dir),
    )


def _semantic_dedup_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine
    from kinbaku_spark.queries.pipeline_ext2 import kmeans_assign_cte

    from kinbaku_spark.functions.hashing import sql_md5_long

    sub = (
        f"{sql_md5_long('CAST(a2.vec_id AS VARCHAR)')}"
        f" % CAST(ceil(szs.sz * 1.0 / {SEMDEDUP_MAX_CELL}) AS BIGINT)"
    )
    return kmeans_assign_cte() + f"""
, szs AS (SELECT cluster, COUNT(*) AS sz FROM a2 GROUP BY cluster),
mem AS (
  SELECT a2.vec_id, a2.cluster, {sub} AS sub, e.embedding
  FROM a2
  JOIN szs ON a2.cluster = szs.cluster
  JOIN embeddings e ON a2.vec_id = e.vec_id
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM mem a JOIN mem b
    ON a.cluster = b.cluster AND a.sub = b.sub AND a.vec_id < b.vec_id
  WHERE ROUND({_sql_cosine('a.embedding', 'b.embedding')}, 6) >= {SEMDEDUP_THRESHOLD}
)
SELECT a2.cluster,
       COUNT(*) AS n_members,
       CAST(SUM(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - SUM(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
GROUP BY a2.cluster
ORDER BY a2.cluster
"""


# -- x_quality_resample: CCNet-style head/middle/tail resampling -------------

def x_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tercile quality buckets (1 = head, 3 = tail) over an exact
    integer-ppm quality score, with the CCNet keep rule: head kept
    entirely, middle hash-sampled at ~50%, tail dropped. Returns per-bucket
    doc counts, kept counts, and kept token mass.

    Score (ppm, all integer arithmetic):
      (alpha_ratio*5 + min(tokens/100, 1)*3 + (1 - digit_ratio)*2) / 10.

    Terciles come from the exact distributed ntile (operators/rank.py:
    range-parallel rank + broadcast total), not a single-partition
    ORDER BY window — the corpus never funnels through one task.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        (F.length("text") - F.length(F.translate("text", "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz", ""))).cast("long").alias("alpha"),
        (F.length("text") - F.length(F.translate("text", "0123456789", ""))).cast("long").alias("digits"),
    )
    scored = feats.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "(CASE WHEN n_chars > 0 THEN alpha * 1000000 div n_chars ELSE 0 END * 5"
            " + LEAST(n_tokens * 10000, 1000000) * 3"
            " + (1000000 - CASE WHEN n_chars > 0 THEN digits * 1000000 div n_chars ELSE 0 END) * 2"
            ") div 10"
        ).alias("score_ppm"),
    )
    bucketed = with_ntile(
        scored, 3, [F.desc("score_ppm"), F.col("doc_id")], "bucket"
    ).withColumn(
        "kept",
        F.when(F.col("bucket") == 1, F.lit(1))
        .when(
            (F.col("bucket") == 2)
            & (md5_long(F.col("doc_id").cast("string")) % 2 == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_tokens")).cast("long").alias("tokens_kept"),
        )
        .orderBy("bucket")
    )


X_QUALITY_RESAMPLE_SQL = rf"""
WITH feats AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits
  FROM documents
),
scored AS (
  SELECT doc_id, n_tokens,
         ((CASE WHEN n_chars > 0 THEN (alpha * 1000000) // n_chars ELSE 0 END) * 5
          + LEAST(n_tokens * 10000, 1000000) * 3
          + (1000000 - (CASE WHEN n_chars > 0 THEN (digits * 1000000) // n_chars ELSE 0 END)) * 2
         ) // 10 AS score_ppm
  FROM feats
),
bucketed AS (
  SELECT doc_id, n_tokens,
         NTILE(3) OVER (ORDER BY score_ppm DESC, doc_id) AS bucket
  FROM scored
),
kept AS (
  SELECT bucket, n_tokens,
         CASE WHEN bucket = 1 THEN 1
              WHEN bucket = 2 AND ({sql_md5_long('CAST(doc_id AS VARCHAR)')}) % 2 = 0 THEN 1
              ELSE 0 END AS kept
  FROM bucketed
)
SELECT bucket, COUNT(*) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_tokens) AS BIGINT) AS tokens_kept
FROM kept
GROUP BY bucket
ORDER BY bucket
"""


QUERIES["x_mixture_weights"] = x_mixture_weights
ORACLES["x_mixture_weights"] = X_MIXTURE_WEIGHTS_SQL
QUERIES["x_semantic_dedup"] = x_semantic_dedup
ORACLES["x_semantic_dedup"] = _semantic_dedup_sql()
QUERIES["x_quality_resample"] = x_quality_resample
ORACLES["x_quality_resample"] = X_QUALITY_RESAMPLE_SQL


# -- x_dataset_shards: deterministic shard manifest --------------------------

N_SHARDS = 16


def x_dataset_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for writing the corpus as N_SHARDS training files:
    every doc hash-assigned (shared 60-bit md5, never engine RNG) to a
    shard; per-shard doc/token/byte totals. ONE groupBy on a uniform key —
    at 100 TB this is the partitionBy(shard) write plan itself, and the
    uniform hash guarantees no straggler shard.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            (md5_long(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("toks"),
            F.length("text").cast("long").alias("bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
            F.sum("bytes").cast("long").alias("n_bytes"),
        )
        .orderBy("shard")
    )


X_DATASET_SHARDS_SQL = rf"""
WITH d AS (
  SELECT ({sql_md5_long('CAST(doc_id AS VARCHAR)')}) % {N_SHARDS} AS shard,
         len(string_split_regex(trim(text), '\s+')) AS toks,
         length(text) AS bytes
  FROM documents
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(bytes) AS BIGINT) AS n_bytes
FROM d GROUP BY shard ORDER BY shard
"""


# -- x_cross_source_overlap: near-dup contamination matrix across sources ----

def x_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate overlap matrix between corpus sources: verified
    MinHash pairs (the x_dedup_minhash pipeline) joined back to each side's
    source, counted per unordered source pair — the cross-dataset
    contamination audit run before mixing corpora.

    Only (id, source) rides the extra joins (the sources dimension is
    broadcast-sized after the per-source distinct); the pair table is
    already candidate-pruned by banding.
    """
    from kinbaku_spark.operators.dedup import minhash_near_duplicates
    from kinbaku_spark.queries.dedup_state import shingle_sets, shingle_state

    docs = load_table(spark, sf_dir, "documents")
    sh, sig = shingle_state(spark, sf_dir)
    pairs = minhash_near_duplicates(
        docs, sh=sh, sig=sig, sets=shingle_sets(spark, sf_dir)
    )  # a < b, verified
    src = docs.select("doc_id", "source")
    a = src.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("source", "sa")
    b = src.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("source", "sb")
    return (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
        .orderBy("source_a", "source_b")
    )


def _cross_source_overlap_sql() -> str:
    from kinbaku_spark.queries.extensions import _minhash_sql

    return f"""
WITH pairs AS ({_minhash_sql()})
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       COUNT(*) AS n_dup_pairs
FROM pairs
JOIN documents da ON pairs.doc_id_a = da.doc_id
JOIN documents db ON pairs.doc_id_b = db.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# -- x_hard_negatives: contrastive-training negative mining ------------------

HARD_NEG_ANCHORS = 8
HARD_NEG_K = 3


def x_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector (vec_id < HARD_NEG_ANCHORS), the top-HARD_NEG_K most-similar
    corpus vectors with a DIFFERENT label — maximally confusable negatives.

    The anchor set is broadcast as a literal-sized dimension, so the scan
    is one map-side pass over the corpus (no corpus shuffle); the per-anchor
    top-k is a bounded window over anchor-partitioned candidates. At 100 TB
    the same query runs per-anchor-batch with the ANN index pruning the
    scan (x_ann_ivf_topk) before exact re-ranking.
    """
    from kinbaku_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < HARD_NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.join(F.broadcast(anchors), F.col("label") != F.col("qlabel"))
        .select(
            "anchor_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HARD_NEG_K)
        .select("anchor_id", "vec_id", "sim", "rk")
        .orderBy("anchor_id", "rk")
    )


def _hard_negatives_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine

    return f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < {HARD_NEG_ANCHORS}
),
scored AS (
  SELECT a.anchor_id, e.vec_id,
         ROUND({_sql_cosine('e.embedding', 'a.qv')}, 6) AS sim
  FROM embeddings e JOIN anchors a ON e.label <> a.qlabel
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY sim DESC, vec_id) AS rk
  FROM scored
)
SELECT anchor_id, vec_id, sim, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {HARD_NEG_K}
ORDER BY anchor_id, rk
"""


QUERIES["x_dataset_shards"] = x_dataset_shards
ORACLES["x_dataset_shards"] = X_DATASET_SHARDS_SQL
QUERIES["x_cross_source_overlap"] = x_cross_source_overlap
ORACLES["x_cross_source_overlap"] = _cross_source_overlap_sql()
QUERIES["x_hard_negatives"] = x_hard_negatives
ORACLES["x_hard_negatives"] = _hard_negatives_sql()


# -- x_embed_alignment: CLIP-style own-centroid alignment filter -------------

ALIGN_LOW = "0.1"  # shared constant, rendered identically into both engines


def x_embed_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-style alignment filter plumbing: every vector's cosine to
    its OWN label centroid, reported per label as (n_members, mean_align,
    n_low) where n_low counts vectors below ALIGN_LOW — the rows a
    multimodal curation pipeline would drop as mis-captioned.

    Centroids come from the exact nano-unit label_centroids aggregation
    (operators/similarity.py) and join back label-to-label — a broadcast
    of k centroid rows, so the corpus never shuffles; the per-label stats
    are one map-side-combined groupBy.

    Determinism: per-row sims rounded to 6dp, per-label mean via exact
    DECIMAL(18,6) sums of the rounded sims (the kmeans_clusters pattern).
    """
    from kinbaku_spark.operators.similarity import cosine, label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cen = label_centroids(emb, "label", "embedding")
    low = F.expr(f"CAST('{ALIGN_LOW}' AS DOUBLE)")
    joined = emb.join(F.broadcast(cen), "label").select(
        "label",
        F.round(cosine(F.col("embedding"), F.col("centroid")), 6).alias("sim"),
    )
    return (
        joined.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.col("sim").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_align"),
            F.sum(F.when(F.col("sim") < low, 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
        )
        .orderBy("label")
    )


def _embed_alignment_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine

    return f"""
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS val
  FROM embeddings
),
cen AS (
  SELECT label, list(avg ORDER BY pos) AS centroid FROM (
    SELECT label, pos,
           CAST(CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * CAST(1000000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(1000000000.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
sims AS (
  SELECT e.label, ROUND({_sql_cosine('e.embedding', 'c.centroid')}, 6) AS sim
  FROM embeddings e JOIN cen c ON e.label = c.label
)
SELECT label, COUNT(*) AS n_members,
       ROUND(CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_align,
       CAST(SUM(CASE WHEN sim < CAST('{ALIGN_LOW}' AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM sims
GROUP BY label
ORDER BY label
"""


QUERIES["x_embed_alignment"] = x_embed_alignment
ORACLES["x_embed_alignment"] = _embed_alignment_sql()


# -- x_bpe_apply: iterative BPE merge training rounds ------------------------

BPE_APPLY_ROUNDS = 3


def x_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, BPE_APPLY_ROUNDS full rounds: each round
    counts adjacent word pairs, picks the argmax merge (ties on pair
    text), APPLIES it to the corpus (space → '_' join), and recounts on
    the merged corpus. Returns (round, pair, cnt) — the learned merge
    table, the part of tokenizer training that actually needs the cluster.

    The per-round pair count is the vocab-bounded shuffle of
    x_bpe_pair_merges; the argmax is a 1-row driver collect (exactly the
    k-means centroid pattern); applying a merge is a map-only string
    replace, so rounds never add shuffles — at 100 TB each round is one
    scan + one vocab-sized aggregate, and the corpus rewrite would
    checkpoint every few rounds to cap lineage.

    Determinism: replace() is left-to-right non-overlapping in both
    engines; counts are exact integers; ties break lexicographically.
    """
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select(F.trim(F.col("text")).alias("t"))
    pair_expr = F.expr(
        "zip_with(slice(words, 1, size(words) - 1),"
        "         slice(words, 2, size(words) - 1),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    learned = []
    for rnd in range(1, BPE_APPLY_ROUNDS + 1):
        tops = (
            cur.select(F.split(F.col("t"), r"\s+").alias("words"))
            .select(F.explode(pair_expr).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not tops:  # no adjacent pairs (empty corpus): no merges to learn
            break
        top = tops[0]
        pair, cnt = top["pair"], int(top["cnt"])
        learned.append((rnd, pair, cnt))
        merged = pair.replace(" ", "_")
        # parameterized (F.lit), never f-string interpolation into F.expr:
        # a pair containing a quote/backslash would break the expression
        # while the DuckDB oracle (scalar subquery) kept working
        cur = cur.select(
            F.replace(F.col("t"), F.lit(pair), F.lit(merged)).alias("t")
        )
    return spark.createDataFrame(learned, "round int, pair string, cnt long")


def _bpe_apply_sql() -> str:
    def count_cte(src: str) -> str:
        return rf"""(
  SELECT pair, COUNT(*) AS cnt FROM (
    SELECT unnest(list_transform(generate_series(1, len(words) - 1),
                                 i -> words[i] || ' ' || words[i + 1])) AS pair
    FROM (SELECT string_split_regex(t, '\s+') AS words FROM {src})
  ) GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1
)"""

    parts = ["t0 AS (SELECT trim(text) AS t FROM documents)"]
    selects = []
    for rnd in range(1, BPE_APPLY_ROUNDS + 1):
        parts.append(f"m{rnd} AS {count_cte(f't{rnd - 1}')}")
        parts.append(
            f"t{rnd} AS (SELECT replace(t, (SELECT pair FROM m{rnd}),"
            f" (SELECT replace(pair, ' ', '_') FROM m{rnd})) AS t FROM t{rnd - 1})"
        )
        selects.append(f"SELECT {rnd} AS round, pair, cnt FROM m{rnd}")
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY round\n"
    )


QUERIES["x_bpe_apply"] = x_bpe_apply
ORACLES["x_bpe_apply"] = _bpe_apply_sql()
