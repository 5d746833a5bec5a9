"""Containment dedup, corpus-diversity impurity, and rank-distribution
windows.

The reference (kerighan/kinbaku) has no text/window surface (SURVEY.md
§2.4); these extend the dedup family (Jaccard's asymmetric sibling), the
dataset-card diversity metrics, and the window-function coverage
(percent_rank / cume_dist).

Shuffle shapes (the 100 TB story):

- containment: identical plan to x_dedup_ngram_jaccard — inverted-index
  candidate join on shared shingle hashes, then exact verification over
  candidates only; at scale the candidate generator swaps to MinHash
  banding (x_dedup_minhash) with the same verify tail.
- impurity: ONE groupBy(source, lang) collapses the corpus; the
  per-source rollup runs over O(sources x langs) rows.
- rank windows: degrees are one groupBy(src); both rank functions share
  ONE window sort over the |V|-sized degree table.

Determinism: containment divides exact intersection counts by the exact
smaller set size (round 6dp — the proven jaccard pattern); impurity is
exact integer ppm ((n² - Σ n_l²)·10⁶ div n²); percent_rank/cume_dist are
ratios of exact integers, IEEE-identical in both engines, rounded 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.operators.dedup import prefix_filter_candidates
from kinbaku_spark.operators.rank import prefix_sums
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_dedup_containment: asymmetric (subset) near-dup detection -------------

CONTAINMENT_THRESHOLD = 0.8


def x_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-duplicates: pairs where the SMALLER document's
    shingle set is >= 80% contained in the other — catches excerpt/
    quotation duplication that symmetric Jaccard misses (a 10x-longer
    superset document caps Jaccard at ~0.1 but containment at 1.0).
    """
    from kinbaku_spark.queries.dedup_state import shingle_sets, shingle_state

    # three consumers (df counts, ranked postings, verify sets) share the
    # session-persisted shingle index (dedup_state.py) — the materialized
    # table every dedup query scans instead of re-shingling the corpus
    sh, _ = shingle_state(spark, sf_dir)

    # Exact prefix filtering (operators/dedup.py prefix_filter_candidates):
    # for containment >= t the smaller set's required overlap is
    # alpha = ceil(t*n), so the prefix is n - ((4n + 4) div 5) + 1 rarest
    # shingles at t = 0.8 (exact integer ceil). Provable superset of the
    # naive self-join pairs -> the naive-SQL oracle stays the unchanged
    # ground truth, while hot-shingle df^2 buckets disappear from the plan.
    cand = prefix_filter_candidates(
        sh, "doc_id", F.col("r") <= F.expr("n - ((4 * n + 4) div 5) + 1")
    )
    # array-set verification (same shape as operators/dedup._jaccard_verify):
    # two doc-keyed joins + codegen array_intersect over candidates only,
    # reading the MATERIALIZED per-doc set index (dedup_state.shingle_sets)
    # instead of re-aggregating the postings per call
    sets = shingle_sets(spark, sf_dir)
    return (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_id_a"), F.col("hs").alias("hs_a")),
            "doc_id_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_id_b"), F.col("hs").alias("hs_b")),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("inter"),
            F.least(F.size("hs_a"), F.size("hs_b")).alias("nmin"),
        )
        .withColumn("containment", F.round(F.col("inter") / F.col("nmin"), 6))
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("doc_id_a", "doc_id_b", "containment")
        .orderBy("doc_id_a", "doc_id_b")
    )


def _containment_sql() -> str:
    from kinbaku_spark.queries.extensions import _sql_shingle_cte

    return f"""
WITH {_sql_shingle_cte(3)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM hx a JOIN hx b ON a.h = b.h
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hx GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS i
  FROM cand c
  JOIN hx a ON a.doc_id = c.doc_id_a
  JOIN hx b ON b.doc_id = c.doc_id_b AND b.h = a.h
  GROUP BY 1, 2
)
SELECT i.doc_id_a, i.doc_id_b,
       ROUND(i.i * 1.0 / LEAST(sa.n, sb.n), 6) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_id_a
JOIN sizes sb ON sb.doc_id = i.doc_id_b
WHERE ROUND(i.i * 1.0 / LEAST(sa.n, sb.n), 6) >= {CONTAINMENT_THRESHOLD}
ORDER BY i.doc_id_a, i.doc_id_b
"""


# -- x_source_lang_impurity: corpus diversity per source ---------------------

def x_source_lang_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of the language mix per source, in exact integer ppm
    ((n² − Σ n_l²)·10⁶ div n²) — the log-free diversity metric for
    dataset cards (0 = monolingual source, →10⁶ = uniform mix).
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("nl"))
    return (
        per.groupBy("source")
        .agg(
            F.sum("nl").alias("n_docs"),
            # DECIMAL sum-of-squares: nl^2 wraps int64 at ~3e9 docs in one
            # (source, lang) cell, and n_docs^2 * 10^6 wraps at just ~3e6
            # docs per source — the tightest overflow bound the ppm audit
            # found; DECIMAL(38,0)/HUGEINT keeps the Gini-Simpson impurity
            # integer-exact at any corpus size on both engines
            F.sum(F.col("nl").cast("decimal(38,0)") * F.col("nl")).alias(
                "ssq"
            ),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.expr(
                "CAST((CAST(n_docs AS DECIMAL(38,0)) * n_docs - ssq)"
                " * 1000000"
                " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"
            ).alias("impurity_ppm"),
        )
        .orderBy("source")
    )


X_LANG_IMPURITY_SQL = """
WITH per AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl
  FROM documents GROUP BY 1, 2
),
agg AS (
  SELECT source, CAST(SUM(nl) AS BIGINT) AS n_docs,
         SUM(CAST(nl AS HUGEINT) * nl) AS ssq,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM per GROUP BY source
)
SELECT source, n_docs, n_langs,
       CAST((CAST(n_docs AS HUGEINT) * n_docs - ssq) * 1000000
              // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
         AS impurity_ppm
FROM agg
ORDER BY source
"""


# -- x_percentile_ranks: percent_rank / cume_dist over degrees ---------------

def x_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier out-degree rank distribution: percent_rank and
    cume_dist (ratios of exact integers — IEEE-identical across engines,
    rounded 6dp), derived from prefix sums over the DEGREE HISTOGRAM
    (operators/rank.py) instead of a window over the node table:
    percent_rank(d) = (rank(d)-1)/(n-1) where rank(d) is the cumulative
    count below d plus one, cume_dist(d) = cumulative count through d
    over n. The only shuffled-and-summed table is the distinct-degree
    histogram; nodes just join their degree's two numbers back.
    """
    from kinbaku_spark.queries.graph_queries import _graph

    e = _graph(spark, sf_dir).edges_df
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("__cnt"))
    # with_totals: n comes from the operator's own per-partition
    # aggregates (n = Σcnt) instead of the separate hist.agg() broadcast
    # this query used to run — that independent subtree re-computed
    # hist→deg→edges per call (r07 profile: input 23.0→11.6 MB, the edges
    # scan halved). deg's two remaining in-plan references (histogram +
    # final per-node join) dedupe via ReusedExchange inside the one
    # action; an explicit lazy pin measured strictly WORSE (20 jobs /
    # 299 tasks vs 13/168 — the checkpoint's raw-RDD materialization
    # stages cost more than they save)
    cum = prefix_sums(
        hist, [F.col("d")], {"__cum": "__cnt"}, with_totals=True
    )
    n = F.col("__total___cum")
    per_d = cum.select(
        "d",
        F.round(
            F.when(
                n > 1,
                (F.col("__cum") - F.col("__cnt")) / (n - 1),
            ).otherwise(F.lit(0.0)),  # PERCENT_RANK defines 0 for n = 1
            6,
        ).alias("pct_rank"),
        F.round(F.col("__cum") / n, 6).alias("cume"),
    )
    return deg.join(per_d, "d").select("src", "d", "pct_rank", "cume").orderBy(
        "d", "src"
    )


def _percentile_ranks_sql() -> str:
    from kinbaku_spark.queries.graph_queries import GRAPH_CTE

    return GRAPH_CTE + """
, deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM g_edges GROUP BY src)
SELECT src, d,
       ROUND(PERCENT_RANK() OVER (ORDER BY d), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (ORDER BY d), 6) AS cume
FROM deg
ORDER BY d, src
"""


QUERIES["x_dedup_containment"] = x_dedup_containment
ORACLES["x_dedup_containment"] = _containment_sql()
QUERIES["x_source_lang_impurity"] = x_source_lang_impurity
ORACLES["x_source_lang_impurity"] = X_LANG_IMPURITY_SQL
QUERIES["x_percentile_ranks"] = x_percentile_ranks
ORACLES["x_percentile_ranks"] = _percentile_ranks_sql()
