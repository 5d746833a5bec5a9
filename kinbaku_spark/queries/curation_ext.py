"""Curation planning: quality-threshold sweep and duplicate-cluster size
distribution.

The reference (kerighan/kinbaku) has no curation surface (SURVEY.md §2.4);
these are the two readouts a filtering run is planned from:

- threshold sweep: docs/tokens retained at each candidate quality cutoff
  — the yield curve that picks the operating point before committing a
  100 TB filter pass.
- cluster sizes: the size histogram of MinHash near-duplicate components
  — duplication's shape (many pairs vs few giant families) decides
  whether survivorship or family-level review is the right dedup action.

Shuffle shapes (the 100 TB story): the sweep is one scan-bound projection
(text_quality rides the parquet scan) cross-joined to a 9-row broadcast
threshold table, then ONE aggregation keyed by threshold — no per-
threshold passes over the corpus. Cluster sizes reuse x_dedup_clusters'
banded-LSH + hash-min label propagation and add two O(|clusters|)
aggregations on top.

Determinism: retention shares are exact integer ppm; the quality score is
the proven 6dp-rounded composite compared against k/100.0 double literals
(identical strtod in both engines); cluster labels are min-doc_id labels,
size buckets exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.operators.text import text_quality
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_quality_threshold_sweep: retention yield curve -------------------------

SWEEP_THRESHOLDS_PCT = list(range(50, 95, 5))  # 0.50 .. 0.90


def x_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs and tokens retained at each candidate quality_score cutoff
    (0.50‥0.90 by 0.05), with exact ppm retention shares — one corpus
    scan, one broadcast cross join, one aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = text_quality(docs).select("quality_score", "n_tokens")
    thr = spark.createDataFrame(
        [(t,) for t in SWEEP_THRESHOLDS_PCT], "thr_pct int"
    )
    keep = F.col("quality_score") >= F.col("thr_pct") / F.lit(100.0)
    return (
        per.crossJoin(F.broadcast(thr))
        .groupBy("thr_pct")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).alias("docs_kept"),
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        )
        .select(
            "thr_pct",
            "docs_kept",
            "tokens_kept",
            # DECIMAL numerators: token mass scales with the corpus and
            # tokens_kept * 10^6 wraps int64 near 9.2e12 tokens (~35 TB
            # of text — inside the 100 TB brief); docs get the same cast
            # so the ppm contract is unconditional
            F.expr(
                "CAST(CAST(docs_kept AS DECIMAL(38,0)) * 1000000"
                " div n_docs AS BIGINT)"
            ).alias("docs_share_ppm"),
            F.expr(
                "CASE WHEN n_tokens_total = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(CAST(tokens_kept AS DECIMAL(38,0)) * 1000000"
                " div n_tokens_total AS BIGINT) END"
            ).alias("tokens_share_ppm"),
        )
        .orderBy("thr_pct")
    )


def _sweep_sql() -> str:
    from kinbaku_spark.queries.extensions import X_TEXT_QUALITY_SQL

    values = ", ".join(f"({t})" for t in SWEEP_THRESHOLDS_PCT)
    return f"""
WITH per AS (SELECT quality_score, n_tokens FROM ({X_TEXT_QUALITY_SQL})),
thr(thr_pct) AS (VALUES {values}),
agg AS (
  SELECT thr_pct,
         CAST(SUM(CASE WHEN quality_score >= thr_pct / 100.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS docs_kept,
         CAST(SUM(CASE WHEN quality_score >= thr_pct / 100.0 THEN n_tokens
                       ELSE 0 END) AS BIGINT) AS tokens_kept,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
  FROM per CROSS JOIN thr
  GROUP BY thr_pct
)
SELECT CAST(thr_pct AS INTEGER) AS thr_pct, docs_kept, tokens_kept,
       CAST(CAST(docs_kept AS HUGEINT) * 1000000 // n_docs AS BIGINT)
         AS docs_share_ppm,
       CAST(CASE WHEN n_tokens_total = 0 THEN 0
                 ELSE CAST(tokens_kept AS HUGEINT) * 1000000 // n_tokens_total
            END AS BIGINT) AS tokens_share_ppm
FROM agg
ORDER BY thr_pct
"""


# -- x_dup_cluster_sizes: near-duplicate family size histogram ----------------

def x_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of MinHash near-duplicate component sizes: how many
    clusters of each size exist and what share of the corpus sits in
    them. Size 1 = unique documents.
    """
    from kinbaku_spark.queries.extensions import dup_cluster_labels

    # the labels are session-persisted engine state (built once per sf_dir)
    labels = dup_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    total = labels.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            # DECIMAL numerator: cluster_size * n_clusters is up to the
            # corpus doc count, and * 10^6 wraps int64 near 9.2e12 docs
            F.expr(
                "CAST(CAST(cluster_size AS DECIMAL(38,0)) * n_clusters"
                " * 1000000 div n_total AS BIGINT)"
            ).alias("docs_share_ppm"),
        )
        .orderBy("cluster_size")
    )


def _cluster_sizes_sql() -> str:
    from kinbaku_spark.queries.extensions import _clusters_sql

    return f"""
WITH labels AS (SELECT * FROM ({_clusters_sql()})),
sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM labels GROUP BY cluster_id
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM labels)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
       CAST(CAST(cluster_size AS HUGEINT) * COUNT(*) * 1000000
              // (SELECT n FROM total)
            AS BIGINT) AS docs_share_ppm
FROM sizes
GROUP BY cluster_size
ORDER BY cluster_size
"""


# -- x_soft_dedup_weights: down-weight duplicate families ---------------------

def x_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of dropping near-duplicates, give every
    document the training weight 10⁶ div |its duplicate family| — the
    family's total influence stays one document's worth while all
    surface variants remain sampleable. Unique docs keep weight 10⁶.
    """
    from kinbaku_spark.queries.extensions import dup_cluster_labels

    labels = dup_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labels.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            F.expr("1000000 div cluster_size").alias("weight_ppm"),
        )
        .orderBy("doc_id")
    )


def _soft_dedup_sql() -> str:
    from kinbaku_spark.queries.extensions import _clusters_sql

    return f"""
WITH labels AS (SELECT * FROM ({_clusters_sql()})),
sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
       CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
FROM labels l JOIN sizes s USING (cluster_id)
ORDER BY l.doc_id
"""


QUERIES["x_quality_threshold_sweep"] = x_quality_threshold_sweep
ORACLES["x_quality_threshold_sweep"] = _sweep_sql()
QUERIES["x_dup_cluster_sizes"] = x_dup_cluster_sizes
ORACLES["x_dup_cluster_sizes"] = _cluster_sizes_sql()
# -- x_minhash_band_sweep: LSH banding-config planner --------------------------

SWEEP_BANDS = (4, 8, 16)  # over the 32-hash signature: r = 8, 4, 2 rows/band
SWEEP_JACCARD = 0.8


def x_minhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate volume vs confirmed-pair precision for three LSH banding
    configs of the same 32-hash MinHash signature — the planning readout
    that picks bands before a corpus-scale dedup run (more bands = higher
    recall, quadratically more candidates to verify).

    The signature table is computed ONCE (checkpointed) and shared by all
    configs; per config the cost is one band equi-join + the exact-Jaccard
    verify over its own candidates. No driver collects — each config's
    counts are 1-row aggregates unioned JVM-side.
    """
    from kinbaku_spark.operators.dedup import (
        _jaccard_verify,
        minhash_band_candidates,
    )
    from kinbaku_spark.queries.dedup_state import shingle_sets, shingle_state

    sh, sig = shingle_state(spark, sf_dir)
    sets = shingle_sets(spark, sf_dir)
    per_config = []
    for b in SWEEP_BANDS:
        # lazy checkpoint: both consumers (count, verify) resolve inside
        # the ONE final action, so the candidates still materialize once —
        # without the three serial per-config jobs the eager form ran at
        # query-construction time (r07 work profile: 28 jobs -> fewer)
        cand = minhash_band_candidates(sig, "doc_id", 32, b).localCheckpoint(
            eager=False
        )
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        n_conf = _jaccard_verify(cand, sh, "doc_id", SWEEP_JACCARD, sets=sets).agg(
            F.count(F.lit(1)).alias("n_confirmed")
        )
        per_config.append(
            n_cand.crossJoin(n_conf).select(
                F.lit(b).alias("bands"),
                F.lit(32 // b).alias("rows_per_band"),
                "n_candidates",
                "n_confirmed",
                F.expr(
                    "CASE WHEN n_candidates = 0 THEN 0"
                    " ELSE n_confirmed * 1000000 div n_candidates END"
                ).alias("precision_ppm"),
            )
        )
    out = per_config[0]
    for p in per_config[1:]:
        out = out.unionByName(p)
    return out.orderBy("bands")


def _band_sweep_sql() -> str:
    from kinbaku_spark.functions.hashing import HASH_PRIME as P
    from kinbaku_spark.functions.hashing import minhash_coeffs
    from kinbaku_spark.queries.extensions import _sql_shingle_cte

    coeffs = minhash_coeffs(32, 42)
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {P}) + {b}) % {P}) AS mh{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    parts = [
        f"{_sql_shingle_cte(3)}".strip().lstrip(","),
        f"sig AS MATERIALIZED (SELECT doc_id, {mins} FROM hx GROUP BY doc_id)",
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM hx GROUP BY doc_id)",
    ]
    selects = []
    for b in SWEEP_BANDS:
        rows = 32 // b
        band_selects = "\n  UNION ALL\n  ".join(
            "SELECT doc_id, {k} AS band, {key} AS key FROM sig".format(
                k=k,
                key=" || '|' || ".join(
                    f"CAST(mh{k * rows + r} AS VARCHAR)" for r in range(rows)
                ),
            )
            for k in range(b)
        )
        parts.append(
            f"""bands{b} AS (
  {band_selects}
),
cand{b} AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands{b} a JOIN bands{b} b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
conf{b} AS (
  SELECT COUNT(*) AS n FROM (
    SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
    FROM cand{b} c
    JOIN hx a ON a.doc_id = c.doc_id_a
    JOIN hx x ON x.doc_id = c.doc_id_b AND x.h = a.h
    GROUP BY 1, 2
  ) j
  JOIN sizes sa ON sa.doc_id = j.doc_id_a
  JOIN sizes sb ON sb.doc_id = j.doc_id_b
  WHERE ROUND(j.i * 1.0 / (sa.n + sb.n - j.i), 6) >= {SWEEP_JACCARD}
)""",
        )
        selects.append(
            f"""SELECT {b} AS bands, {rows} AS rows_per_band,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{b}) AS n_candidates,
       (SELECT CAST(n AS BIGINT) FROM conf{b}) AS n_confirmed,
       CAST(CASE WHEN (SELECT COUNT(*) FROM cand{b}) = 0 THEN 0
                 ELSE (SELECT n FROM conf{b}) * 1000000
                      // (SELECT COUNT(*) FROM cand{b}) END AS BIGINT)
         AS precision_ppm"""
        )
    union = "\nUNION ALL\n".join(selects)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(bands AS INTEGER) AS bands,
       CAST(rows_per_band AS INTEGER) AS rows_per_band,
       n_candidates, n_confirmed, precision_ppm
FROM (
{union}
) ORDER BY bands
"""
    )


QUERIES["x_soft_dedup_weights"] = x_soft_dedup_weights
ORACLES["x_soft_dedup_weights"] = _soft_dedup_sql()
# -- x_normalized_dedup: normalization's effect on exact dedup ----------------

def x_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row normalization audit: how many exact-dup groups exist on the
    raw text vs after canonical normalization (lowercase, whitespace
    collapse, trim) — `extra_merged` is the number of distinct raw texts
    that normalization folds together, i.e. the dup mass raw-exact dedup
    would MISS. The canonical pre-dedup pass every curation pipeline runs
    first; one projection + one aggregate, rides the scan at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        docs.select(
            F.md5(norm).alias("norm_hash"), F.md5(F.col("text")).alias("raw_hash")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_hash").alias("raw_distinct"),
            F.countDistinct("norm_hash").alias("norm_distinct"),
        )
        .select(
            "n_docs",
            "raw_distinct",
            "norm_distinct",
            (F.col("n_docs") - F.col("raw_distinct")).alias("raw_dup_docs"),
            (F.col("raw_distinct") - F.col("norm_distinct")).alias("extra_merged"),
        )
    )


X_NORMALIZED_DEDUP_SQL = r"""
WITH h AS (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
         md5(text) AS raw_hash
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_hash) AS BIGINT) AS raw_distinct,
       CAST(COUNT(DISTINCT norm_hash) AS BIGINT) AS norm_distinct,
       CAST(COUNT(*) - COUNT(DISTINCT raw_hash) AS BIGINT) AS raw_dup_docs,
       CAST(COUNT(DISTINCT raw_hash) - COUNT(DISTINCT norm_hash) AS BIGINT)
         AS extra_merged
FROM h
"""


QUERIES["x_minhash_band_sweep"] = x_minhash_band_sweep
ORACLES["x_minhash_band_sweep"] = _band_sweep_sql()
QUERIES["x_normalized_dedup"] = x_normalized_dedup
ORACLES["x_normalized_dedup"] = X_NORMALIZED_DEDUP_SQL
