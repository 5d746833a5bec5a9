"""Grouped exact order statistics and collocation mining.

The reference (kerighan/kinbaku) has no aggregation or text surface
(SURVEY.md §2.4); these extend the statistics layer on `lineitem` and
`documents`.

Shuffle shapes (the 100 TB story):

- grouped quantiles: the classic scalable exact-order-statistic plan —
  groupBy (group, value) collapses the fact table to its distinct-value
  histogram (map-side partials; bounded by the value domain, not the row
  count), then ONE window over the per-group histogram computes the
  cumulative counts; no per-group row sort ever happens. The same
  partitioning serves the window and the final rollup.
- collocations: the vocabulary is cut to the top-K document-frequency
  tokens FIRST (one aggregate, broadcast back), so the pair join fans
  out at most K(K-1)/2 pairs per doc regardless of document length; the
  doc-id equi-join is co-partitioned with the incidence aggregation.

Determinism: the k-th order statistic is "min value with cumulative
count >= k" (tie-order-free); lift is exact integer ppm; top-K vocab and
final ranking break ties on token text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_group_quantiles: exact per-group quartiles without per-group sorts ----

def x_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/median/p75 of l_extendedprice per return flag, computed
    from the per-group distinct-value histogram (cumulative counts over
    distinct cents) — the shuffle-light replacement for sortWithinGroups
    quantiles, exact where percentile_approx is not.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    # lazily pinned: the cumulative window and the totals both consume
    # the histogram — unpinned, its groupBy shuffle re-ran per consumer
    hist = (
        cents.groupBy("l_returnflag", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wc))
    # per-group totals FROM the histogram (sum of bucket counts == row
    # count, exactly): the direct count re-scanned lineitem a second time
    # — one full corpus pass deleted (guide §1.2 "don't compute twice")
    totals = hist.groupBy("l_returnflag").agg(F.sum("cnt").alias("n"))
    j = cum.join(F.broadcast(totals), "l_returnflag")
    pick = lambda k: F.min(F.when(F.col("cum") >= F.expr(k), F.col("c")))  # noqa: E731
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n_items"),
            pick("(n + 3) div 4").alias("p25_cents"),
            pick("(n + 1) div 2").alias("median_cents"),
            pick("(3 * n + 3) div 4").alias("p75_cents"),
        )
        .withColumn("iqr_cents", F.expr("p75_cents - p25_cents"))
        .orderBy("l_returnflag")
    )


X_GROUP_QUANTILES_SQL = """
WITH cents AS (
  SELECT l_returnflag, CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
hist AS (
  SELECT l_returnflag, c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cents GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, c,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
totals AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM cents GROUP BY 1
)
SELECT j.l_returnflag,
       MAX(j.n) AS n_items,
       MIN(CASE WHEN j.cum >= (j.n + 3) // 4 THEN j.c END) AS p25_cents,
       MIN(CASE WHEN j.cum >= (j.n + 1) // 2 THEN j.c END) AS median_cents,
       MIN(CASE WHEN j.cum >= (3 * j.n + 3) // 4 THEN j.c END) AS p75_cents,
       MIN(CASE WHEN j.cum >= (3 * j.n + 3) // 4 THEN j.c END)
         - MIN(CASE WHEN j.cum >= (j.n + 3) // 4 THEN j.c END) AS iqr_cents
FROM (SELECT c.*, t.n FROM cum c JOIN totals t USING (l_returnflag)) j
GROUP BY j.l_returnflag
ORDER BY j.l_returnflag
"""


# -- x_collocations: token-pair lift (log-free PMI) --------------------------

COLLOC_VOCAB = 30  # top tokens by document frequency
COLLOC_MIN_BOTH = 5
COLLOC_TOP = 30


def x_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: for pairs of high-document-frequency tokens,
    the lift n_both*N/(n_a*n_b) in exact integer ppm — the log-free PMI
    the keyword/phrase-extraction stage ranks by.

    The vocabulary is capped to the top-30 df tokens before any pair is
    formed, bounding the per-doc fan-out at 435 pairs independent of
    document length; lift stays in integer arithmetic end to end.
    """
    docs = load_table(spark, sf_dir, "documents")
    inc = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    df_counts = inc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # distributed top-k (TakeOrderedAndProject: per-partition K-heaps),
    # never a row_number window ranking the full vocabulary
    vocab = (
        df_counts.orderBy(F.desc("df"), "tok")
        .limit(COLLOC_VOCAB)
        .select("tok", "df")
    )
    kept = inc.join(F.broadcast(vocab), "tok")
    pairs = (
        kept.select("doc_id", F.col("tok").alias("t1"), F.col("df").alias("df1"))
        .join(
            kept.select(
                "doc_id", F.col("tok").alias("t2"), F.col("df").alias("df2")
            ),
            "doc_id",
        )
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .where(F.col("n_both") >= COLLOC_MIN_BOTH)
        .select(
            "t1",
            "t2",
            "n_both",
            F.expr("n_both * n_docs * 1000000 div (df1 * df2)").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "t1", "t2")
        .limit(COLLOC_TOP)
    )


X_COLLOCATIONS_SQL = f"""
WITH inc AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
dfc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM inc GROUP BY tok),
vocab AS (
  SELECT tok, df FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rn FROM dfc
  ) WHERE rn <= {COLLOC_VOCAB}
),
kept AS (SELECT i.doc_id, i.tok, v.df FROM inc i JOIN vocab v USING (tok)),
pairs AS (
  SELECT a.tok AS t1, b.tok AS t2, a.df AS df1, b.df AS df2,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2, 3, 4
)
SELECT t1, t2, n_both,
       CAST((n_both * (SELECT COUNT(*) FROM documents) * 1000000)
            // (df1 * df2) AS BIGINT) AS lift_ppm
FROM pairs
WHERE n_both >= {COLLOC_MIN_BOTH}
ORDER BY lift_ppm DESC, t1, t2
LIMIT {COLLOC_TOP}
"""


QUERIES["x_group_quantiles"] = x_group_quantiles
ORACLES["x_group_quantiles"] = X_GROUP_QUANTILES_SQL
QUERIES["x_collocations"] = x_collocations
ORACLES["x_collocations"] = X_COLLOCATIONS_SQL
