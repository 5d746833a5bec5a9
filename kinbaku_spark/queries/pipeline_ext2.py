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

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, k=KMEANS_K, rounds=KMEANS_ROUNDS)


def _kmeans_sql() -> str:
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
           CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg
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
SELECT cluster, COUNT(*) AS n_members,
       ROUND(CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_sim
FROM a2 GROUP BY cluster
"""


QUERIES["x_kmeans_clusters"] = x_kmeans_clusters
ORACLES["x_kmeans_clusters"] = _kmeans_sql()
