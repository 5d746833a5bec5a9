"""Classifier-evaluation operators over the documents corpus: exact ROC
AUC (Mann-Whitney rank form with tie correction), calibration
(reliability) bins, and a thresholded confusion-matrix / F1 sweep.

Score = the engine's composite quality_score (operators/text.py, rounded
6dp); label = ``lang = 'en'`` — "does the text-quality composite separate
English documents?" — deterministic and data-derived, so both engines
reproduce it bit-equal. The reference (kerighan/kinbaku) has no
evaluation surface at all (SURVEY.md §2.4); this completes the
train-eval loop next to x_mrr_eval / x_ndcg_eval / x_cluster_purity.

Scale shapes (the 100 TB story):

- ROC AUC: one corpus-sized groupBy onto DISTINCT score values — the
  score rounds to 6dp in [0, 1], so the distinct table is bounded at
  1,000,001 rows at ANY corpus size — then a cumulative window over that
  BOUNDED table (never a window over corpus rows) and one aggregation.
- calibration: one groupBy onto 10 bins, map-side partials do the work.
- confusion sweep: a 5-row threshold table broadcast-cross-joined into
  one aggregation — one corpus scan for all thresholds.

Determinism: every readout is integer arithmetic end-to-end. Per-row
score_ppm = CAST(ROUND(quality_score * 1e6) AS BIGINT) (exact: the score
is a 6dp rounding, so ppm is integral up to one float ulp that ROUND
absorbs identically in both engines); bins and threshold comparisons use
score_ppm, never double compares at bin edges; AUC uses the integer
identity 2·avg_rank(group) = 2·cum_before + group_size + 1, so
auc_ppm = (Σ_pos 2·avg_rank − P(P+1)) · 10^6 div (2·P·N) is exact
integer division on both sides (Mann-Whitney U with midrank ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.operators.text import text_quality
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

CONFUSION_THRESHOLDS_PCT = [50, 60, 70, 80, 90]
CALIBRATION_BINS = 10


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_ppm, pos): integer ppm score + binary label."""
    docs = load_table(spark, sf_dir, "documents")
    q = text_quality(docs).select(
        "doc_id",
        F.round(F.col("quality_score") * 1_000_000)
        .cast("long")
        .alias("score_ppm"),
    )
    lab = docs.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("pos")
    )
    return q.join(lab, "doc_id")


_SCORED_SQL_TMPL = """
scored AS (
  SELECT q.doc_id,
         CAST(ROUND(q.quality_score * 1000000) AS BIGINT) AS score_ppm,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM ({quality}) q JOIN documents d ON d.doc_id = q.doc_id
)"""


def _scored_sql() -> str:
    from kinbaku_spark.queries.extensions import X_TEXT_QUALITY_SQL

    return _SCORED_SQL_TMPL.format(quality=X_TEXT_QUALITY_SQL)


# -- x_roc_auc: exact Mann-Whitney AUC with midrank ties ----------------------


def x_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of quality_score against the English label, plus the
    class counts. The rank pass runs over the bounded distinct-score
    table (module docstring); ties take midranks, so the readout equals
    sklearn's roc_auc_score to the ppm."""
    g = (
        _scored(spark, sf_dir)
        .groupBy("score_ppm")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("pos").alias("cp"))
    )
    w = Window.orderBy("score_ppm").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = g.select(
        "c",
        "cp",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_before"),
    )
    agg = r.agg(
        F.sum(
            F.col("cp").cast("decimal(38,0)")
            * (2 * F.col("cum_before") + F.col("c") + 1)
        ).cast("decimal(38,0)")
        .alias("r2"),
        F.sum("cp").alias("n_pos"),
        F.sum(F.col("c") - F.col("cp")).alias("n_neg"),
    )
    # numerator in DECIMAL(38,0): r2 ~ 2*P*n, so the ppm-scaled numerator
    # wraps int64 near 5M docs — wide decimals keep the integer-exact
    # contract at any corpus size (both engines; ADVICE r06)
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "((r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
            " * 1000000)"
            " div (CAST(greatest(2 * n_pos * n_neg, 1) AS DECIMAL(38,0)))"
        )
        .cast("long")
        .alias("auc_ppm"),
    )


def _roc_auc_sql() -> str:
    return f"""
WITH {_scored_sql()},
g AS (SELECT score_ppm, COUNT(*) AS c, SUM(pos) AS cp FROM scored GROUP BY score_ppm),
r AS (
  SELECT c, cp,
         COALESCE(SUM(c) OVER (ORDER BY score_ppm
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM g
),
a AS (
  SELECT SUM(CAST(cp AS HUGEINT) * (2 * cum_before + c + 1)) AS r2,
         SUM(cp) AS n_pos, SUM(c - cp) AS n_neg
  FROM r
)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
         // CAST(greatest(2 * n_pos * n_neg, 1) AS HUGEINT) AS BIGINT) AS auc_ppm
FROM a
"""


# -- x_calibration_bins: reliability diagram ----------------------------------


def x_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins: decile bins on score_ppm (integer edges — no
    double compares at bin boundaries), per-bin doc count, mean score
    and positive rate in exact ppm. The gap column is the per-bin
    calibration error (mean score − positive rate)."""
    s = _scored(spark, sf_dir)
    binned = s.select(
        F.least(
            F.expr(f"score_ppm div {1_000_000 // CALIBRATION_BINS}"),
            F.lit(CALIBRATION_BINS - 1).cast("long"),
        ).alias("bin"),
        "score_ppm",
        "pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").alias("n_pos"),
            F.sum("score_ppm").alias("sum_score_ppm"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.expr("sum_score_ppm div n_docs").alias("mean_score_ppm"),
            F.expr("n_pos * 1000000 div n_docs").alias("pos_rate_ppm"),
            F.expr(
                "sum_score_ppm div n_docs - n_pos * 1000000 div n_docs"
            ).alias("gap_ppm"),
        )
        .orderBy("bin")
    )


def _calibration_sql() -> str:
    bin_w = 1_000_000 // CALIBRATION_BINS
    return f"""
WITH {_scored_sql()},
b AS (
  SELECT LEAST(score_ppm // {bin_w}, {CALIBRATION_BINS - 1}) AS bin,
         score_ppm, pos
  FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS mean_score_ppm,
       CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm,
       CAST(SUM(score_ppm) // COUNT(*)
            - SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS gap_ppm
FROM b GROUP BY bin ORDER BY bin
"""


# -- x_confusion_f1: thresholded confusion matrix + F1 sweep ------------------


def x_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix and precision/recall/F1 (exact ppm) at each
    candidate decision threshold — prediction = score_ppm >= thr_pct ·
    10^4 (integer compare). One scan, thresholds broadcast."""
    s = _scored(spark, sf_dir)
    thr = spark.createDataFrame(
        [(t,) for t in CONFUSION_THRESHOLDS_PCT], "thr_pct int"
    )
    pred = F.col("score_ppm") >= F.col("thr_pct") * 10_000
    return (
        s.crossJoin(F.broadcast(thr))
        .groupBy("thr_pct")
        .agg(
            F.sum(F.when(pred & (F.col("pos") == 1), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(pred & (F.col("pos") == 0), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~pred & (F.col("pos") == 1), 1).otherwise(0)).alias("fn"),
            F.sum(F.when(~pred & (F.col("pos") == 0), 1).otherwise(0)).alias("tn"),
        )
        .select(
            "thr_pct",
            "tp",
            "fp",
            "fn",
            "tn",
            F.expr("tp * 1000000 div greatest(tp + fp, 1)").alias(
                "precision_ppm"
            ),
            F.expr("tp * 1000000 div greatest(tp + fn, 1)").alias(
                "recall_ppm"
            ),
            F.expr(
                "2 * tp * 1000000 div greatest(2 * tp + fp + fn, 1)"
            ).alias("f1_ppm"),
        )
        .orderBy("thr_pct")
    )


def _confusion_sql() -> str:
    thr_rows = ", ".join(f"({t})" for t in CONFUSION_THRESHOLDS_PCT)
    return f"""
WITH {_scored_sql()},
thr(thr_pct) AS (VALUES {thr_rows}),
j AS (
  SELECT t.thr_pct,
         CASE WHEN s.score_ppm >= t.thr_pct * 10000 THEN 1 ELSE 0 END AS pred,
         s.pos
  FROM scored s CROSS JOIN thr t
)
SELECT CAST(thr_pct AS INTEGER) AS thr_pct,
       CAST(SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN pred = 1 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN pred = 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN pred = 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       CAST(SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END) * 1000000
         // greatest(SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END), 1) AS BIGINT) AS precision_ppm,
       CAST(SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END) * 1000000
         // greatest(SUM(CASE WHEN pos = 1 THEN 1 ELSE 0 END), 1) AS BIGINT) AS recall_ppm,
       CAST(2 * SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END) * 1000000
         // greatest(2 * SUM(CASE WHEN pred = 1 AND pos = 1 THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN pred = 1 AND pos = 0 THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN pred = 0 AND pos = 1 THEN 1 ELSE 0 END), 1) AS BIGINT) AS f1_ppm
FROM j GROUP BY thr_pct ORDER BY thr_pct
"""


QUERIES["x_roc_auc"] = x_roc_auc
ORACLES["x_roc_auc"] = _roc_auc_sql()
QUERIES["x_calibration_bins"] = x_calibration_bins
ORACLES["x_calibration_bins"] = _calibration_sql()
QUERIES["x_confusion_f1"] = x_confusion_f1
ORACLES["x_confusion_f1"] = _confusion_sql()
