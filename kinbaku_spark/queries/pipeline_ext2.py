"""Training-data pipeline operators, batch 2: BPE-style merge-pair counting
(the tokenizer-training inner loop), EWMA trend smoothing over the event
stream, and per-domain quota capping (Common-Crawl-style corpus balancing).

The reference (kerighan/kinbaku) has no text/tokenizer/time surface at all
(SURVEY.md §2.4); these extend the engine's LLM-data-curation surface on the
driver's `documents` / `events` tables.

Shuffle shapes (the 100 TB story):

- BPE pairs: tokenize + adjacent-pair explode are narrow (flatMap per
  document, zero shuffle); the ONE shuffle is the pair-count groupBy, with
  map-side partial aggregation collapsing each partition to its distinct
  pairs (vocab-bounded, not corpus-bounded) before the exchange; the top-k
  is TakeOrderedAndProject, never a global sort.
- EWMA: facts collapse via ONE groupBy (event_type, day) — map-side
  partials again — then all per-day work happens on the tiny aggregate
  (types x days rows), never over raw events.
- quota: one hash shuffle on (source, lang) for the per-group rank; the
  output is group-sized. At 100 TB the rank-by-hash stays a single window
  pass per partition group; hot domains are bounded by the quota itself.

Determinism: integer counts; EWMA folds doubles SEQUENTIALLY over the
day-ordered prefix (`F.aggregate` on the Spark side, `list_reduce` in
DuckDB — same left fold, same IEEE ops, bit-equal) with shared constants
rendered via string->double casts; quota ranks on the shared 60-bit
md5-derived hash (functions/hashing.py), never on engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.sources.tables import load_table

# -- x_bpe_pair_merges: adjacent-pair frequency, the BPE merge step ----------

BPE_TOP_K = 20


def x_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-`BPE_TOP_K` adjacent word pairs by corpus frequency — the
    counting step of one BPE merge round (word-level granularity: the
    driver's `documents.text` is already whitespace-tokenizable).

    Pair construction is `zip_with` over two shifted slices of the token
    array — pure per-row JVM expressions, no UDF, no shuffle until the
    vocab-bounded count.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        "zip_with(slice(words, 1, size(words) - 1),"
        "         slice(words, 2, size(words) - 1),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    return (
        docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("words"))
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(BPE_TOP_K)
    )


X_BPE_PAIR_SQL = rf"""
WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS words FROM documents),
p AS (
  SELECT list_transform(generate_series(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i + 1]) AS pairs
  FROM w
),
e AS (SELECT unnest(pairs) AS pair FROM p)
SELECT pair, COUNT(*) AS cnt FROM e
GROUP BY pair ORDER BY cnt DESC, pair LIMIT {BPE_TOP_K}
"""


# -- x_ewma_daily: exponentially weighted daily trend ------------------------

EWMA_ALPHA = "0.3"  # rendered identically into both engines via string cast


def x_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily counts with an EWMA trend line
    (s_1 = x_1; s_t = (1-alpha) * s_{t-1} + alpha * x_t).

    The fold runs over the day-ordered PREFIX of each type's daily series:
    `F.aggregate` seeded with the first element replicates DuckDB's
    `list_reduce` left fold exactly. Day cardinality is tiny (types x days),
    so the quadratic prefix expansion is on the aggregate, never the stream.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    ar = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cnt"))).alias("a")
    )
    a0 = F.lit(EWMA_ALPHA).cast("double")
    a1 = F.lit("1.0").cast("double") - a0
    ex = ar.select("event_type", "a", F.posexplode("a").alias("pos", "e"))
    rest = F.expr("transform(slice(a, 2, pos), s -> CAST(s.cnt AS DOUBLE))")
    seed = F.element_at(F.col("a"), 1)["cnt"].cast("double")
    return ex.select(
        "event_type",
        F.col("e.day").cast("string").alias("day"),
        F.col("e.cnt").alias("cnt"),
        F.round(
            F.aggregate(rest, seed, lambda acc, x: acc * a1 + x * a0), 6
        ).alias("ewma"),
    )


X_EWMA_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
ar AS (
  SELECT event_type, list(struct_pack(day := day, cnt := cnt) ORDER BY day) AS a
  FROM daily GROUP BY 1
),
ex AS (
  SELECT event_type, a, generate_subscripts(a, 1) AS pos, unnest(a) AS e FROM ar
)
SELECT event_type, CAST(e.day AS VARCHAR) AS day, e.cnt AS cnt,
       ROUND(list_reduce(
         list_transform(list_slice(a, 1, pos), s -> CAST(s.cnt AS DOUBLE)),
         (acc, x) -> acc * (CAST('1.0' AS DOUBLE) - CAST('{EWMA_ALPHA}' AS DOUBLE))
                     + x * CAST('{EWMA_ALPHA}' AS DOUBLE)), 6) AS ewma
FROM ex
"""


# -- x_domain_quota: per-(source, lang) corpus balancing ---------------------

QUOTA_PER_GROUP = 20


def x_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each (source, lang) group at `QUOTA_PER_GROUP` documents, chosen
    by the shared 60-bit md5 hash of doc_id (deterministic pseudo-random,
    no engine RNG); report total/kept/dropped per group — the corpus
    balancing step that stops one domain from dominating a training mix.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source", "lang").orderBy(h.alias("h"), "doc_id")
    ranked = docs.select(
        "source", "lang", (F.row_number().over(w) <= QUOTA_PER_GROUP).alias("keep")
    )
    return ranked.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("keep"), 1)).alias("kept"),
        F.count(F.when(~F.col("keep"), 1)).alias("dropped"),
    )


X_DOMAIN_QUOTA_SQL = f"""
WITH ranked AS (
  SELECT source, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source, lang
           ORDER BY {sql_md5_long("CAST(doc_id AS VARCHAR)")}, doc_id
         ) <= {QUOTA_PER_GROUP} AS keep
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS total,
       COUNT(*) FILTER (WHERE keep) AS kept,
       COUNT(*) FILTER (WHERE NOT keep) AS dropped
FROM ranked
GROUP BY source, lang
"""


QUERIES = {
    "x_bpe_pair_merges": x_bpe_pair_merges,
    "x_ewma_daily": x_ewma_daily,
    "x_domain_quota": x_domain_quota,
}

ORACLES = {
    "x_bpe_pair_merges": X_BPE_PAIR_SQL,
    "x_ewma_daily": X_EWMA_SQL,
    "x_domain_quota": X_DOMAIN_QUOTA_SQL,
}


# -- x_kmeans_clusters: Lloyd's k-means over the embedding corpus ------------
# (operator in operators/similarity.py — see its docstring for the
# zero-shuffle assignment / d×k-aggregate recompute scale shape)

KMEANS_K = 8
KMEANS_ROUNDS = 2


def x_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinbaku_spark.operators.similarity import kmeans_clusters
    from kinbaku_spark.queries import kmeans_state

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, assigned=kmeans_state.assignment(spark, sf_dir))


def kmeans_assign_cte() -> str:
    """The ``WITH … a2`` prefix replaying two Lloyd's rounds in DuckDB —
    ``a2(vec_id, cluster, sim)`` is the final assignment. Shared by the
    k-means query and the SemDeDup replay (pipeline_ext3)."""
    from kinbaku_spark.queries.extensions import _sql_cosine

    return f"""
WITH seeds AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster, embedding AS centroid
  FROM embeddings WHERE vec_id < {KMEANS_K}
),
a1p AS (
  SELECT e.vec_id, s.cluster,
         ROUND({_sql_cosine('e.embedding', 's.centroid')}, 6) AS sim
  FROM embeddings e CROSS JOIN seeds s
),
a1 AS (
  SELECT vec_id, cluster, sim FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cluster) AS rn
    FROM a1p
  ) WHERE rn = 1
),
ex AS (
  SELECT a1.cluster, generate_subscripts(e.embedding, 1) AS pos,
         unnest(e.embedding) AS val
  FROM embeddings e JOIN a1 ON e.vec_id = a1.vec_id
),
cen AS (
  SELECT cluster, list(avg ORDER BY pos) AS centroid FROM (
    SELECT cluster, pos,
           CAST(CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * CAST(1000000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(1000000000.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg
    FROM ex GROUP BY cluster, pos
  ) GROUP BY cluster
),
a2p AS (
  SELECT e.vec_id, c.cluster,
         ROUND({_sql_cosine('e.embedding', 'c.centroid')}, 6) AS sim
  FROM embeddings e CROSS JOIN cen c
),
a2 AS (
  SELECT vec_id, cluster, sim FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cluster) AS rn
    FROM a2p
  ) WHERE rn = 1
)
"""


def _kmeans_sql() -> str:
    return kmeans_assign_cte() + """
SELECT cluster, COUNT(*) AS n_members,
       ROUND(CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_sim
FROM a2 GROUP BY cluster
"""


QUERIES["x_kmeans_clusters"] = x_kmeans_clusters
ORACLES["x_kmeans_clusters"] = _kmeans_sql()


# -- x_dedup_recall_eval: MinHash banding quality vs exact ground truth ------

DEDUP_EVAL_N = 150  # fixed-size subcorpus: the exact all-pairs truth stays
# O(DEDUP_EVAL_N^2) at every scale factor — the evaluation harness is
# constant-cost; the PIPELINE under test is the production banding path.


def x_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash banding stage against exact all-pairs
    Jaccard ground truth on a fixed subcorpus (doc_id < DEDUP_EVAL_N).

    Candidates are PRE-verification band pairs (the set the verify join
    would touch); truth is every pair with exact Jaccard >= the production
    threshold. This is the measurement that justifies banding at 100 TB:
    recall says what the pigeonhole misses, precision says how much work
    verification must absorb. Ratios in integer ppm (exact replay).
    """
    from kinbaku_spark.operators.dedup import minhash_band_candidates
    from kinbaku_spark.queries.extensions import (
        MINHASH_THRESHOLD,
        N_BANDS,
        N_HASHES,
    )

    from kinbaku_spark.queries.dedup_state import shingle_state

    # the eval corpus is a doc_id prefix: shingles/signatures are per-doc,
    # so filtering the session-persisted index equals re-deriving on the
    # filtered corpus
    sh_full, sig_full = shingle_state(spark, sf_dir)
    sh = sh_full.filter(F.col("doc_id") < DEDUP_EVAL_N)
    sig = sig_full.filter(F.col("doc_id") < DEDUP_EVAL_N)
    cand = minhash_band_candidates(sig, "doc_id", N_HASHES, N_BANDS).select(
        F.col("doc_id_a").alias("da"), F.col("doc_id_b").alias("db")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("da"), "h")
        .join(sh.select(F.col("doc_id").alias("db"), "h"), "h")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .filter(
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6)
            >= MINHASH_THRESHOLD
        )
        .select("da", "db")
    )
    j = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)), ["da", "db"], "full_outer"
    )
    agg = j.agg(
        F.count("t").alias("n_truth"),
        F.count("c").alias("n_cand"),
        F.count(F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1)).alias("tp"),
        F.count(F.when(F.col("c").isNotNull() & F.col("t").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("t").isNotNull() & F.col("c").isNull(), 1)).alias("fn"),
    )
    return agg.select(
        "n_truth",
        "n_cand",
        "tp",
        "fp",
        "fn",
        F.expr("tp * 1000000 div greatest(n_cand, 1)").alias("precision_ppm"),
        F.expr("tp * 1000000 div greatest(n_truth, 1)").alias("recall_ppm"),
    )


def _dedup_eval_sql() -> str:
    from kinbaku_spark.functions.hashing import HASH_PRIME, minhash_coeffs
    from kinbaku_spark.queries.extensions import (
        BAND_ROWS,
        MINHASH_THRESHOLD,
        N_BANDS,
        N_HASHES,
        _sql_shingle_cte,
    )

    coeffs = minhash_coeffs(N_HASHES, 42)
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {HASH_PRIME}) + {b}) % {HASH_PRIME}) AS mh{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for k in range(N_BANDS):
        key = " || '|' || ".join(
            f"CAST(mh{k * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        band_selects.append(f"SELECT doc_id, {k} AS band, {key} AS key FROM sig")
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    src = f"(SELECT * FROM documents WHERE doc_id < {DEDUP_EVAL_N})"
    return f"""
WITH {_sql_shingle_cte(3, src)},
sig AS (SELECT doc_id, {mins} FROM hx GROUP BY doc_id),
bands AS (
  {bands_sql}
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hx GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
  FROM hx a JOIN hx b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.da, i.db
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.da
  JOIN sizes sb ON sb.doc_id = i.db
  WHERE ROUND(i.i / (sa.n + sb.n - i.i), 6) >= {MINHASH_THRESHOLD}
),
j AS (
  SELECT t.da IS NOT NULL AS has_t, c.da IS NOT NULL AS has_c
  FROM truth t FULL OUTER JOIN cand c ON t.da = c.da AND t.db = c.db
),
agg AS (
  SELECT COUNT(*) FILTER (WHERE has_t) AS n_truth,
         COUNT(*) FILTER (WHERE has_c) AS n_cand,
         COUNT(*) FILTER (WHERE has_t AND has_c) AS tp,
         COUNT(*) FILTER (WHERE has_c AND NOT has_t) AS fp,
         COUNT(*) FILTER (WHERE has_t AND NOT has_c) AS fn
  FROM j
)
SELECT n_truth, n_cand, tp, fp, fn,
       tp * 1000000 // greatest(n_cand, 1) AS precision_ppm,
       tp * 1000000 // greatest(n_truth, 1) AS recall_ppm
FROM agg
"""


QUERIES["x_dedup_recall_eval"] = x_dedup_recall_eval
ORACLES["x_dedup_recall_eval"] = _dedup_eval_sql()


# -- x_langid_eval: confusion matrix of the language-ID heuristic ------------

def x_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language classifier against the
    corpus's labeled `lang` column: (true lang, predicted lang, n). The
    model-evaluation shape: prediction is per-row map-side work; the ONE
    shuffle is the tiny (langs x langs) count."""
    from kinbaku_spark.operators.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _langid_eval_sql() -> str:
    from kinbaku_spark.queries.extensions import _lang_id_sql

    return f"""
SELECT d.lang, p.pred_lang, COUNT(*) AS n
FROM documents d JOIN ({_lang_id_sql()}) p ON p.doc_id = d.doc_id
GROUP BY 1, 2
"""


QUERIES["x_langid_eval"] = x_langid_eval
ORACLES["x_langid_eval"] = _langid_eval_sql()


# -- x_entity_blocking: blocked entity-resolution candidate pairs ------------

BLOCK_LEV_MAX = 15


def x_entity_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking over part names: block on (first word,
    second word, p_size), generate within-block pairs, keep pairs with
    Levenshtein distance <= BLOCK_LEV_MAX.

    The scale pattern behind every record-linkage pipeline: blocking turns
    the O(n^2) cross join into one equi-join shuffle on the block key, and
    total work becomes sum-of-block^2 (bounded by the key design; skewed
    blocks split by AQE). Complements x_fuzzy_match, which is the
    broadcast-probe variant for a small query side.
    """
    part = load_table(spark, sf_dir, "part")
    w = F.split(F.col("p_name"), " ")
    keyed = part.select(
        "p_partkey",
        "p_name",
        w.getItem(0).alias("w1"),
        w.getItem(1).alias("w2"),
        "p_size",
    )
    a = keyed.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        "w1", "w2", "p_size",
    )
    b = keyed.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
        "w1", "w2", "p_size",
    )
    return (
        a.join(b, ["w1", "w2", "p_size"])
        .filter(F.col("part_a") < F.col("part_b"))
        .select(
            "part_a",
            "part_b",
            F.levenshtein("name_a", "name_b").alias("lev"),
        )
        .filter(F.col("lev") <= BLOCK_LEV_MAX)
    )


X_ENTITY_BLOCKING_SQL = f"""
WITH k AS (
  SELECT p_partkey, p_name,
         string_split(p_name, ' ')[1] AS w1,
         string_split(p_name, ' ')[2] AS w2,
         p_size
  FROM part
)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev
FROM k a JOIN k b
  ON a.w1 = b.w1 AND a.w2 = b.w2 AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {BLOCK_LEV_MAX}
"""


QUERIES["x_entity_blocking"] = x_entity_blocking
ORACLES["x_entity_blocking"] = X_ENTITY_BLOCKING_SQL


# -- x_embed_outliers: centroid-similarity z-score outliers per label -------

OUTLIER_Z = "2.0"


def x_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality gate: flag vectors whose cosine similarity to
    their OWN label centroid is a >=2-sigma low outlier within the label —
    mislabeled or corrupted vectors sit far from their cluster center.
    (Norm-based screens are useless here: the corpus is unit-normalized.)

    Determinism: cosines round to 6dp, bridge to INTEGER micro-units via a
    decimal cast (double->decimal is correctly rounded on both engines),
    and every statistic is then an exact integer sum. Doubles reappear
    only through int->double conversions (IEEE-exact everywhere) — NOT
    fractional decimal->double casts, whose last-ulp rounding differs
    between engines (found at sf0.1). z is computed in micro-unit space,
    where it is scale-invariant. Shape: k x d centroid table broadcast;
    ONE groupBy(label).
    """
    from kinbaku_spark.operators.similarity import cosine, label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cen = label_centroids(emb, "label", "embedding")
    sim = F.round(cosine(F.col("embedding"), F.col("centroid")), 6)
    su = (sim.cast("decimal(18,6)") * 1000000).cast("long")
    sims = emb.join(F.broadcast(cen), "label").select(
        "vec_id", "label", sim.alias("sim"), su.alias("su")
    )
    d38 = "decimal(38,0)"
    stats = sims.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("su")).cast("long").alias("s1i"),
        F.sum(F.col("su").cast(d38) * F.col("su").cast(d38)).alias("s2i"),
    )
    j = sims.join(F.broadcast(stats), "label")
    nd = F.col("n").cast("double")
    s1d = F.col("s1i").cast("double")
    mean_u = s1d / nd
    var_u = (F.col("s2i").cast("double") - s1d * s1d / nd) / (
        nd - F.lit("1.0").cast("double")
    )
    z = (F.col("su").cast("double") - mean_u) / F.sqrt(var_u)
    zt = F.lit(OUTLIER_Z).cast("double")
    return j.select(
        "vec_id",
        "label",
        "sim",
        F.round(z, 6).alias("z"),
    ).filter(F.col("z") <= -zt)


def _embed_outliers_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_cosine

    mean_u = "(CAST(s1i AS DOUBLE) / CAST(n AS DOUBLE))"
    var_u = (
        "((CAST(s2i AS DOUBLE) - CAST(s1i AS DOUBLE) * CAST(s1i AS DOUBLE)"
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))"
    )
    z = f"((CAST(su AS DOUBLE) - {mean_u}) / sqrt({var_u}))"
    return f"""
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS val
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
  SELECT e.vec_id, e.label,
         ROUND({_sql_cosine('e.embedding', 'c.centroid')}, 6) AS sim,
         CAST(CAST(ROUND({_sql_cosine('e.embedding', 'c.centroid')}, 6)
                   AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS su
  FROM embeddings e JOIN cen c ON c.label = e.label
),
stats AS (
  SELECT label, COUNT(*) AS n,
         CAST(SUM(su) AS BIGINT) AS s1i,
         SUM(CAST(su AS DECIMAL(38,0)) * CAST(su AS DECIMAL(38,0))) AS s2i
  FROM sims GROUP BY label
)
SELECT vec_id, r.label, sim,
       ROUND({z}, 6) AS z
FROM sims r JOIN stats s ON s.label = r.label
WHERE ROUND({z}, 6) <= -CAST('{OUTLIER_Z}' AS DOUBLE)
"""


QUERIES["x_embed_outliers"] = x_embed_outliers
ORACLES["x_embed_outliers"] = _embed_outliers_sql()


# -- x_zorder_layout: Morton-code clustering stats over orders ---------------

ZORDER_BUCKETS_SHIFT = 12  # top 4 of 16 z-bits -> 16 buckets


def x_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket bounding boxes for orders clustered by the Morton code
    of (customer key, order day): each bucket's (x, y) ranges stay tight in
    BOTH dimensions — the property that makes parquet min/max stats prune
    scans for either predicate after a z-ordered rewrite
    (sources/layout.py, the OPTIMIZE ZORDER pattern). Pure bit arithmetic,
    exact replay; one groupBy over bucket ids computed map-side.
    """
    from kinbaku_spark.sources.layout import ZBITS, morton2

    orders = load_table(spark, sf_dir, "orders")
    mask = (1 << ZBITS) - 1
    x = F.col("o_custkey").bitwiseAND(F.lit(mask)).cast("long")
    y = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .bitwiseAND(F.lit(mask))
        .cast("long")
    )
    z = morton2(x, y, ZBITS)
    rows = orders.select(
        x.alias("x"), y.alias("y"),
        F.shiftright(z, ZORDER_BUCKETS_SHIFT).alias("bucket"),
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


def _zorder_sql() -> str:
    from kinbaku_spark.sources.layout import ZBITS, sql_morton2

    mask = (1 << ZBITS) - 1
    z = sql_morton2("x", "y", ZBITS)
    return f"""
WITH base AS (
  SELECT (o_custkey & {mask}) AS x,
         (datediff('day', DATE '1992-01-01', o_orderdate) & {mask}) AS y
  FROM orders
),
rows_z AS (
  SELECT x, y, ({z} >> {ZORDER_BUCKETS_SHIFT}) AS bucket FROM base
)
SELECT bucket, COUNT(*) AS n,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM rows_z GROUP BY bucket
"""


QUERIES["x_zorder_layout"] = x_zorder_layout
ORACLES["x_zorder_layout"] = _zorder_sql()


# -- x_image_phash_dedup: perceptual-hash near-dup pairs (multimodal) --------

PHASH_MAX_HAMMING = 3


def x_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the binary payload column
    (operators/multimodal.py): Arrow-batched 60-bit dHash, 15-bit banding,
    exact bit_count(xor) verification. The payload here is the document
    bytes (this container has no image decoder — the sampling 'decode' is
    the deterministic stand-in), but the plumbing IS the production shape:
    bytes stay put, only 8-byte hashes shuffle."""
    from kinbaku_spark.operators.multimodal import (
        phash_near_duplicates,
        with_binary_payload,
    )

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    # report EVERY band-colliding candidate with its verified distance
    # (non-trivial at every scale; true dups exist only where the corpus
    # has near-identical payloads) and flag the <=PHASH_MAX_HAMMING dups
    pairs = phash_near_duplicates(docs, max_hamming=60)
    return pairs.withColumn(
        "is_dup", F.col("hamming") <= PHASH_MAX_HAMMING
    )


def _phash_sql() -> str:
    # byte at 0-based offset p of the (ASCII) payload = unicode(substr(text, p+1, 1))
    samples = (
        "list_transform(generate_series(0, 60), "
        "i -> unicode(substr(text, CAST(i * n // 61 AS INT) + 1, 1)))"
    )
    bits = (
        "list_transform(generate_series(1, 60), "
        "i -> CASE WHEN ls[i + 1] > ls[i] "
        "THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)"
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, phash, {k} AS band, (phash >> {15 * k}) & 32767 AS key FROM ph"
        for k in range(4)
    )
    return f"""
WITH s AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
),
sampled AS (SELECT doc_id, {samples} AS ls FROM s),
ph AS (
  SELECT doc_id,
         CAST(list_aggregate({bits}, 'sum') AS BIGINT) AS phash
  FROM sampled
),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                  a.phash AS ha, b.phash AS hb
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b,
       CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
       bit_count(xor(ha, hb)) <= {PHASH_MAX_HAMMING} AS is_dup
FROM cand
WHERE bit_count(xor(ha, hb)) <= 60
"""


QUERIES["x_image_phash_dedup"] = x_image_phash_dedup
ORACLES["x_image_phash_dedup"] = _phash_sql()


# -- x_vocab_coverage: OOV rate per source vs the top-K corpus vocab ---------

VOCAB_K = 200


def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-readiness stat: build the top-`VOCAB_K` token vocabulary
    from the corpus itself (count desc, token asc — deterministic), then
    per source report total tokens, in-vocab tokens, and OOV rate in ppm.

    Two shuffles total: the vocab count (vocab-bounded after map-side
    partials) and the per-source rollup; the vocab table broadcasts for
    the membership probe.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    probed = toks.join(F.broadcast(vocab), "tok", "left")
    return probed.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.count(F.col("in_vocab")).alias("in_vocab_tokens"),
        F.expr(
            "(count(1) - count(in_vocab)) * 1000000 div count(1)"
        ).alias("oov_ppm"),
    )


X_VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT source, t.tok
  FROM documents,
       LATERAL (
         SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
       ) t
  WHERE t.tok <> ''
),
vocab AS (
  SELECT tok, 1 AS in_vocab FROM (
    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ORDER BY cnt DESC, tok LIMIT {VOCAB_K}
  )
)
SELECT source,
       COUNT(*) AS total_tokens,
       COUNT(v.in_vocab) AS in_vocab_tokens,
       (COUNT(*) - COUNT(v.in_vocab)) * 1000000 // COUNT(*) AS oov_ppm
FROM toks LEFT JOIN vocab v ON v.tok = toks.tok
GROUP BY source
"""


QUERIES["x_vocab_coverage"] = x_vocab_coverage
ORACLES["x_vocab_coverage"] = X_VOCAB_COVERAGE_SQL


# -- x_minhash_estimate_eval: signature-estimated vs exact Jaccard -----------

def x_minhash_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy eval: for every banding candidate pair, compare the
    signature-estimated Jaccard (fraction of agreeing minima, in exact
    1/32nds -> ppm) against the true shingle Jaccard, reporting the error.
    The companion to x_dedup_recall_eval: that one grades candidate
    RECALL, this one grades the ESTIMATOR the candidates are ranked by.
    Everything is integer arithmetic (agreement counts, ppm floors).
    """
    from kinbaku_spark.operators.dedup import minhash_band_candidates
    from kinbaku_spark.queries.extensions import N_BANDS, N_HASHES

    from kinbaku_spark.queries.dedup_state import shingle_state

    # the eval corpus is a doc_id prefix: shingles/signatures are per-doc,
    # so filtering the session-persisted index equals re-deriving on the
    # filtered corpus
    sh_full, sig_full = shingle_state(spark, sf_dir)
    sh = sh_full.filter(F.col("doc_id") < DEDUP_EVAL_N)
    sig = sig_full.filter(F.col("doc_id") < DEDUP_EVAL_N)
    cand = minhash_band_candidates(sig, "doc_id", N_HASHES, N_BANDS)
    sa = sig.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(N_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(N_HASHES)
    )
    est = cand.join(sa, "doc_id_a").join(sb, "doc_id_b").select(
        "doc_id_a", "doc_id_b", agree.alias("n_agree")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("doc_id_a"), "h")
        .join(sh.select(F.col("doc_id").alias("doc_id_b"), "h"), "h")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    exact = (
        est.join(inter, ["doc_id_a", "doc_id_b"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na")),
            "doc_id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb")),
            "doc_id_b",
        )
    )
    i = F.coalesce("i", F.lit(0))
    est_ppm = F.expr(f"n_agree * 1000000 div {N_HASHES}")
    true_ppm = (i * 1000000).cast("long") / (F.col("na") + F.col("nb") - i)
    true_ppm_i = F.floor(true_ppm).cast("long")
    return exact.select(
        "doc_id_a",
        "doc_id_b",
        "n_agree",
        est_ppm.alias("est_ppm"),
        true_ppm_i.alias("true_ppm"),
        F.abs(est_ppm - true_ppm_i).alias("abs_err_ppm"),
    )


def _minhash_est_sql() -> str:
    from kinbaku_spark.functions.hashing import HASH_PRIME, minhash_coeffs
    from kinbaku_spark.queries.extensions import (
        BAND_ROWS,
        N_BANDS,
        N_HASHES,
        _sql_shingle_cte,
    )

    coeffs = minhash_coeffs(N_HASHES, 42)
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {HASH_PRIME}) + {b}) % {HASH_PRIME}) AS mh{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for k in range(N_BANDS):
        key = " || '|' || ".join(
            f"CAST(mh{k * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        band_selects.append(f"SELECT doc_id, {k} AS band, {key} AS key FROM sig")
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    agree = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
        for j in range(N_HASHES)
    )
    src = f"(SELECT * FROM documents WHERE doc_id < {DEDUP_EVAL_N})"
    return f"""
WITH {_sql_shingle_cte(3, src)},
sig AS (SELECT doc_id, {mins} FROM hx GROUP BY doc_id),
bands AS (
  {bands_sql}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc_id_a, c.doc_id_b, ({agree}) AS n_agree
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_id_a
  JOIN sig sb ON sb.doc_id = c.doc_id_b
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hx GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS i
  FROM hx a JOIN hx b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT e.doc_id_a, e.doc_id_b, e.n_agree,
       e.n_agree * 1000000 // {N_HASHES} AS est_ppm,
       CAST(floor(COALESCE(i.i, 0) * 1000000
                  / (sa.n + sb.n - COALESCE(i.i, 0))) AS BIGINT) AS true_ppm,
       abs(e.n_agree * 1000000 // {N_HASHES}
           - CAST(floor(COALESCE(i.i, 0) * 1000000
                        / (sa.n + sb.n - COALESCE(i.i, 0))) AS BIGINT))
         AS abs_err_ppm
FROM est e
LEFT JOIN inter i ON i.doc_id_a = e.doc_id_a AND i.doc_id_b = e.doc_id_b
JOIN sizes sa ON sa.doc_id = e.doc_id_a
JOIN sizes sb ON sb.doc_id = e.doc_id_b
"""


QUERIES["x_minhash_estimate_eval"] = x_minhash_estimate_eval
ORACLES["x_minhash_estimate_eval"] = _minhash_est_sql()


# -- x_dataset_card: one-row corpus summary (the dataset-card numbers) -------

def x_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numbers every dataset card leads with, in one pass + one
    distinct: doc/source/lang counts, token and char totals, exact-dup doc
    count (docs minus distinct texts), and English share in ppm. Fused
    conditional aggregates over a single scan; the only extra shuffle is
    the distinct-text count (128-bit-hash distinct at scale).
    """
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(ntok.cast("long")).alias("total_tokens"),
        F.count_distinct("text").alias("distinct_texts"),
        # CASE guard: ANSI div errors on 0/0 for an empty corpus, where
        # DuckDB's // yields NULL — make both produce NULL explicitly
        F.expr(
            "CASE WHEN count(1) = 0 THEN NULL"
            " ELSE count(CASE WHEN lang = 'en' THEN 1 END) * 1000000 div count(1)"
            " END"
        ).alias("en_ppm"),
    )
    return agg.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        "total_tokens",
        "distinct_texts",
        (F.col("n_docs") - F.col("distinct_texts")).alias("dup_docs"),
        "en_ppm",
    )


X_DATASET_CARD_SQL = r"""
SELECT n_docs, n_sources, n_langs, total_chars, total_tokens,
       distinct_texts, n_docs - distinct_texts AS dup_docs, en_ppm
FROM (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT source) AS n_sources,
         COUNT(DISTINCT lang) AS n_langs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS total_tokens,
         COUNT(DISTINCT text) AS distinct_texts,
         COUNT(CASE WHEN lang = 'en' THEN 1 END) * 1000000 // COUNT(*)
           AS en_ppm
  FROM documents
)
"""


QUERIES["x_dataset_card"] = x_dataset_card
ORACLES["x_dataset_card"] = X_DATASET_CARD_SQL


# -- x_repeated_ngram_rate: cross-doc exact-substring duplication signal -----

REP_NGRAM_N = 8


def x_repeated_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rate of 8-gram positions whose 8-gram also appears in
    ANOTHER document — the exact-substring duplication signal behind
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al.): a high rate means the doc is largely boilerplate shared across
    the corpus, even when no single near-duplicate partner exists.

    Two shuffles: gram -> set of docs (bounded by gram vocabulary after
    map-side partials), then the per-doc rollup; the gram table carries
    60-bit hashes, never text. Rates in integer ppm (exact replay).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    # NOTE: guard short docs explicitly — Spark's sequence(1, 0) DESCENDS
    # ([1, 0]) instead of being empty like DuckDB's generate_series(1, 0)
    grams = F.expr(
        f"CASE WHEN size(words) >= {REP_NGRAM_N} THEN "
        f"transform(sequence(1, size(words) - {REP_NGRAM_N - 1}),"
        f" i -> concat_ws(' ', slice(words, i, {REP_NGRAM_N})))"
        f" ELSE array() END"
    )
    # two consumers (the gram->doc-count aggregate and the position join):
    # checkpoint the exploded gram table or the split+hash scan runs twice
    # lazy: both consumers resolve inside the one final action, so the
    # explode still materializes once without a construction-time job
    pos = (
        docs.select("doc_id", words.alias("words"))
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", md5_long(F.col("gram")).alias("h"))
        .localCheckpoint(eager=False)
    )
    # a gram position is "repeated" when its gram occurs in >= 2 DISTINCT docs
    gram_docs = pos.distinct().groupBy("h").agg(
        F.count(F.lit(1)).alias("docs_with")
    )
    j = pos.join(gram_docs, "h")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("docs_with") >= 2, 1)).alias("repeated"),
        F.expr(
            "count(CASE WHEN docs_with >= 2 THEN 1 END) * 1000000 div count(1)"
        ).alias("repeated_ppm"),
    )


def _repeated_ngram_sql() -> str:
    return rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents
),
pos AS (
  SELECT doc_id, {sql_md5_long('gram')} AS h FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(words) - {REP_NGRAM_N - 1}, 0)),
             i -> array_to_string(list_slice(words, i, i + {REP_NGRAM_N - 1}), ' ')
           )) AS gram
    FROM w
  )
),
gram_docs AS (
  SELECT h, COUNT(*) AS docs_with FROM (SELECT DISTINCT doc_id, h FROM pos)
  GROUP BY h
)
SELECT p.doc_id,
       COUNT(*) AS n_grams,
       COUNT(CASE WHEN g.docs_with >= 2 THEN 1 END) AS repeated,
       COUNT(CASE WHEN g.docs_with >= 2 THEN 1 END) * 1000000 // COUNT(*)
         AS repeated_ppm
FROM pos p JOIN gram_docs g ON g.h = p.h
GROUP BY p.doc_id
"""


QUERIES["x_repeated_ngram_rate"] = x_repeated_ngram_rate
ORACLES["x_repeated_ngram_rate"] = _repeated_ngram_sql()


# -- x_hashing_trick_vectors: text -> fixed-dim count vectors ----------------

HT_DIM = 64


def x_hashing_trick_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing ('hashing trick') document vectors: every token maps
    to dimension md5(token) % HT_DIM and the doc's vector is the count per
    dimension — the classic way to featurize unbounded vocabularies into
    fixed-width vectors with no dictionary to build, broadcast, or keep
    consistent across 1000 executors. Output is the canonical
    comma-joined vector plus nnz/l1 stats; all integers, exact replay.

    ONE shuffle (doc_id, dim) after map-side combine; the dense vector is
    assembled per doc with a sort inside the aggregate, never a second
    shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    dims = toks.select(
        "doc_id", F.pmod(md5_long(F.col("tok")), F.lit(HT_DIM)).alias("dim")
    )
    per_dim = dims.groupBy("doc_id", "dim").agg(F.count(F.lit(1)).alias("c"))
    return per_dim.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: F.concat(
                    s["dim"].cast("string"), F.lit(":"), s["c"].cast("string")
                ),
            ),
            ",",
        ).alias("vec_sparse"),
        F.count(F.lit(1)).alias("nnz"),
        F.sum("c").cast("long").alias("l1"),
    )


X_HASHING_TRICK_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (
         SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
       ) t
  WHERE t.tok <> ''
),
per_dim AS (
  SELECT doc_id, {sql_md5_long('tok')} % {HT_DIM} AS dim, COUNT(*) AS c
  FROM toks GROUP BY 1, 2
)
SELECT doc_id,
       string_agg(CAST(dim AS VARCHAR) || ':' || CAST(c AS VARCHAR), ','
                  ORDER BY dim) AS vec_sparse,
       COUNT(*) AS nnz,
       CAST(SUM(c) AS BIGINT) AS l1
FROM per_dim GROUP BY doc_id
"""


QUERIES["x_hashing_trick_vectors"] = x_hashing_trick_vectors
ORACLES["x_hashing_trick_vectors"] = X_HASHING_TRICK_SQL


# -- x_ab_test_lift: hash-split A/B conversion analysis ----------------------

def x_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a deterministic hash split: users hash
    into arm A or B (md5 parity — the same stable bucketing a real
    experiment framework uses, no RNG), conversion = user had a purchase
    event. Per arm: users, converters, conversion ppm; plus the pooled
    two-proportion z statistic computed from exact integer counts in one
    fixed double expression (the assortativity pattern).
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct().select(
        "user_id",
        F.pmod(md5_long(F.col("user_id").cast("string")), F.lit(2)).alias("arm"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    per_arm = (
        users.join(F.broadcast(conv), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("converted").alias("converters"),
        )
    )
    a = per_arm.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("na"), F.col("converters").alias("ca")
    )
    b = per_arm.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("nb"), F.col("converters").alias("cb")
    )
    j = a.crossJoin(b)
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    pa = F.col("ca").cast("double") / nad
    pb = F.col("cb").cast("double") / nbd
    pool = (F.col("ca") + F.col("cb")).cast("double") / (nad + nbd)
    one = F.lit("1.0").cast("double")
    se = F.sqrt(pool * (one - pool) * (one / nad + one / nbd))
    zero = F.lit("0.0").cast("double")
    # degenerate pools (0% or 100% conversion) have zero variance: no z
    z = F.when((pool > zero) & (pool < one), F.round((pb - pa) / se, 6))
    return j.select(
        "na", "ca", "nb", "cb",
        F.expr("ca * 1000000 div na").alias("conv_a_ppm"),
        F.expr("cb * 1000000 div nb").alias("conv_b_ppm"),
        z.alias("z_stat"),
    )


def _ab_test_sql() -> str:
    h = sql_md5_long("CAST(user_id AS VARCHAR)")
    return f"""
WITH users AS (
  SELECT user_id, {h} % 2 AS arm FROM (SELECT DISTINCT user_id FROM events)
),
conv AS (
  SELECT DISTINCT user_id, 1 AS converted FROM events
  WHERE event_type = 'purchase'
),
per_arm AS (
  SELECT arm, COUNT(*) AS n_users, COUNT(c.converted) AS converters
  FROM users u LEFT JOIN conv c ON c.user_id = u.user_id
  GROUP BY arm
),
a AS (SELECT n_users AS na, converters AS ca FROM per_arm WHERE arm = 0),
b AS (SELECT n_users AS nb, converters AS cb FROM per_arm WHERE arm = 1)
SELECT na, ca, nb, cb,
       ca * 1000000 // na AS conv_a_ppm,
       cb * 1000000 // nb AS conv_b_ppm,
       CASE WHEN (CAST(ca + cb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) > CAST('0.0' AS DOUBLE)
             AND (CAST(ca + cb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) < CAST('1.0' AS DOUBLE)
       THEN ROUND(
         ((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
          - (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)))
         / sqrt(
             (CAST(ca + cb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
             * (CAST('1.0' AS DOUBLE)
                - (CAST(ca + cb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))))
             * (CAST('1.0' AS DOUBLE) / CAST(na AS DOUBLE)
                + CAST('1.0' AS DOUBLE) / CAST(nb AS DOUBLE))
           ), 6) END AS z_stat
FROM a CROSS JOIN b
"""


QUERIES["x_ab_test_lift"] = x_ab_test_lift
ORACLES["x_ab_test_lift"] = _ab_test_sql()
