"""Distribution-drift monitoring: total-variation distance between data
cohorts and the exact Kolmogorov-Smirnov statistic.

The reference (kerighan/kinbaku) has no statistics surface (SURVEY.md
§2.4); these extend the data-monitoring layer on `orders` — the checks a
production pipeline runs between yesterday's and today's feed before
promoting a model.

Shuffle shapes (the 100 TB story):

- TVD drift: each cohort collapses to 10 histogram cells map-side (one
  groupBy over bucketed integer cents); the distance is computed on the
  20-cell aggregate.
- KS: the classic exact formulation — ONE distinct-value histogram with
  per-cohort counts (map-side partials), cumulative sums via one window
  over distinct values, then a scalar max. No per-row sort, no sampling:
  the value domain bounds the window input, not the row count.

Determinism: buckets and CDF steps use integer-cents arithmetic; both
distances are exact integer ppm — |c1·n2 − c2·n1| stays in int64
(~10^6 · 10^6 · 10^2 at sf0.1 needs headroom, so the cross products are
computed in DECIMAL(38,0)/HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.operators.rank import prefix_sums
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

DRIFT_SPLIT = "1996-01-01"  # orders span ~1992-1998; roughly halves them
DRIFT_BUCKETS = 10


# -- x_distribution_drift: bucketed total-variation distance -----------------

def x_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the order-value distributions of
    the early and late order cohorts, over 10 equi-width buckets from the
    GLOBAL min/max (shared bucket edges — the drift-monitoring
    contract): TVD_ppm = Σ|share_a − share_b| / 2. Per-bucket shares are
    reported so the alert can point at the drifted region.
    """
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(DRIFT_SPLIT).cast("timestamp")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        F.when(F.col("o_orderdate") < cutoff, 0).otherwise(1).alias("cohort"),
    )
    stats = cents.agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    bucketed = cents.crossJoin(F.broadcast(stats)).select(
        "cohort",
        F.expr(f"(c - mn) * {DRIFT_BUCKETS} div (mx - mn + 1)").alias("bucket"),
    )
    cells = (
        bucketed.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_b"),
        )
    )
    w = Window.partitionBy()
    return (
        cells.withColumn("ta", F.sum("n_a").over(w))
        .withColumn("tb", F.sum("n_b").over(w))
        .select(
            "bucket",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("n_a * 1000000 div ta").alias("share_a_ppm"),
            F.expr("n_b * 1000000 div tb").alias("share_b_ppm"),
            F.expr(
                "abs(n_a * 1000000 div ta - n_b * 1000000 div tb)"
            ).alias("abs_diff_ppm"),
        )
        .orderBy("bucket")
    )


X_DISTRIBUTION_DRIFT_SQL = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c,
         CASE WHEN o_orderdate < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END
           AS cohort
  FROM orders
),
stats AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM cents),
bucketed AS (
  SELECT cohort, ((c - mn) * {DRIFT_BUCKETS}) // (mx - mn + 1) AS bucket
  FROM cents CROSS JOIN stats
),
cells AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM bucketed GROUP BY bucket
)
SELECT bucket, n_a, n_b,
       CAST((n_a * 1000000) // SUM(n_a) OVER () AS BIGINT) AS share_a_ppm,
       CAST((n_b * 1000000) // SUM(n_b) OVER () AS BIGINT) AS share_b_ppm,
       CAST(ABS((n_a * 1000000) // SUM(n_a) OVER ()
                - (n_b * 1000000) // SUM(n_b) OVER ()) AS BIGINT) AS abs_diff_ppm
FROM cells
ORDER BY bucket
"""


# -- x_ks_statistic: exact two-sample Kolmogorov-Smirnov ---------------------

def x_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between the cohorts' order values:
    max |CDF_a − CDF_b| over every distinct value, computed on the
    distinct-value histogram (the scalable exact formulation — no row
    sort, no interpolation, no sampling). Cross products run in wide
    integers; the statistic is integer ppm.
    """
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(DRIFT_SPLIT).cast("timestamp")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        F.when(F.col("o_orderdate") < cutoff, 0).otherwise(1).alias("cohort"),
    )
    hist = cents.groupBy("c").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("da"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("db"),
    )
    # exact running CDFs via range-parallel prefix sums (operators/
    # rank.py) over the distinct-value histogram — unconditional at any
    # value-domain size, no single-partition window. with_totals attaches
    # na/nb from the operator's own per-partition aggregates (na = Σda,
    # nb = Σdb — exact integer identities over the histogram), instead of
    # the second full-corpus cents pass this query used to run for them
    cum = prefix_sums(
        hist, [F.col("c")], {"ca": "da", "cb": "db"}, with_totals=True
    ).select(
        "ca",
        "cb",
        F.col("__total_ca").alias("na"),
        F.col("__total_cb").alias("nb"),
    )
    return (
        cum
        .select(
            F.expr(
                "abs(CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)"
            ).alias("diff"),
            "na",
            "nb",
        )
        .groupBy("na", "nb")
        .agg(F.max("diff").alias("maxdiff"))
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.expr(
                "CAST(maxdiff * 1000000 div (CAST(na AS DECIMAL(38,0)) * nb)"
                " AS BIGINT)"
            ).alias("ks_ppm"),
        )
    )


X_KS_SQL = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c,
         CASE WHEN o_orderdate < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END
           AS cohort
  FROM orders
),
hist AS (
  SELECT c,
         CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS db
  FROM cents GROUP BY c
),
cum AS (
  SELECT SUM(da) OVER w AS ca, SUM(db) OVER w AS cb
  FROM hist
  WINDOW w AS (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM cents
)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(MAX(ABS(CAST(c.ca AS HUGEINT) * t.nb - CAST(c.cb AS HUGEINT) * t.na))
              * 1000000 // (CAST(t.na AS HUGEINT) * t.nb) AS BIGINT) AS ks_ppm
FROM cum c CROSS JOIN totals t
GROUP BY t.na, t.nb
"""


QUERIES["x_distribution_drift"] = x_distribution_drift
ORACLES["x_distribution_drift"] = X_DISTRIBUTION_DRIFT_SQL
QUERIES["x_ks_statistic"] = x_ks_statistic
ORACLES["x_ks_statistic"] = X_KS_SQL
