"""Time-series diagnostics: exact lag-k autocorrelation, CUSUM
change-point detection, and MAD-based robust outlier counts.

The reference (kerighan/kinbaku) has no time-series surface (SURVEY.md
§2.4); these extend the monitoring/forecast-prep layer on `orders`.

Shuffle shapes (the 100 TB story):

- all three collapse the fact table to ONE ROW PER DAY first (map-side
  partials); every subsequent join/window/aggregate runs over the tiny
  day series (O(10^4) rows for decades). The lag join is an equi-join of
  the series with itself on shifted integer epoch-days; CUSUM is one
  prefix-sum window; MAD applies the distinct-value-histogram median
  twice (no row sort).

Determinism: the scaled-deviation trick keeps CUSUM exact — deviations
are (c_i·n − total), i.e. n times the true deviation, so prefix sums
stay integers and argmax/ties break on the earliest day; ACF uses exact
integer moments with the one final double expression (wide-integer
products); MAD medians are "min value with cum count >= k" selections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DAILY_SPARK = None  # (built inline per query; days are tiny)


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("ed")
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("c"))


_DAILY_SQL = """
daily AS (
  SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ed,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
)
"""


# -- x_autocorrelation: ACF at lags 1..7 over daily revenue ------------------

ACF_MAX_LAG = 7


def x_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k Pearson autocorrelation (k = 1..7) of daily revenue — the
    ACF panel read before picking AR/seasonal model orders. Each lag is
    an equi-join of the day series on shifted epoch-days (calendar lag,
    not row lag: gap days genuinely break pairs), then exact integer
    moments.
    """
    daily = _daily(spark, sf_dir)
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = daily.select(F.col("ed").alias("ea"), F.col("c").alias("x"))
    b = daily.select(F.col("ed").alias("eb"), F.col("c").alias("y"))
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("eb") == F.col("ea") - F.col("k"))
    )
    d38 = "decimal(38,0)"
    mom = pairs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum((F.col("x").cast(d38) * F.col("y").cast(d38))).cast(d38).alias("sxy"),
        F.sum((F.col("x").cast(d38) * F.col("x").cast(d38))).cast(d38).alias("sxx"),
        F.sum((F.col("y").cast(d38) * F.col("y").cast(d38))).cast(d38).alias("syy"),
    )
    n = F.col("n_pairs").cast(d38)
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return mom.select(
        "k", "n_pairs", F.round(num / den, 6).alias("acf")
    ).orderBy("k")


X_AUTOCORRELATION_SQL = f"""
WITH {_DAILY_SQL},
lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS k),
pairs AS (
  SELECT l.k, a.c AS x, b.c AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.ed = a.ed - l.k
),
mom AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY k
)
SELECT CAST(k AS INTEGER) AS k, n_pairs,
       ROUND(
         CAST(CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(CAST(n_pairs AS HUGEINT) * syy - sy * sy AS DOUBLE))),
         6) AS acf
FROM mom
ORDER BY k
"""


# -- x_cusum_changepoint: exact CUSUM level-shift detector -------------------

def x_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate on daily revenue: the day where the
    running sum of deviations from the global mean peaks in magnitude.
    Deviations are scaled by n (c_i·n − total) so every prefix sum is an
    exact integer — no mean-rounding drift; ties break on the earliest
    day.
    """
    daily = _daily(spark, sf_dir)
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("total")
    )
    w = Window.orderBy("ed").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d38 = "decimal(38,0)"
    cusum = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "dev",
            (F.col("c").cast(d38) * F.col("n").cast(d38)
             - F.col("total").cast(d38)),
        )
        .withColumn("cusum", F.sum("dev").over(w))
        .withColumn("mag", F.abs(F.col("cusum")))
    )
    wpick = Window.orderBy(F.desc("mag"), "ed")
    return (
        cusum.withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("ed")),
                "yyyy-MM-dd",
            ).alias("changepoint_day"),
            F.col("n").cast("long").alias("n_days"),
            F.col("cusum").cast("string").alias("cusum_scaled"),
        )
    )


X_CUSUM_SQL = f"""
WITH {_DAILY_SQL},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS total
        FROM daily),
cusum AS (
  SELECT d.ed, t.n,
         SUM(CAST(d.c AS HUGEINT) * t.n - t.total)
           OVER (ORDER BY d.ed ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cusum
  FROM daily d CROSS JOIN tot t
),
pick AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(cusum) DESC, ed) AS rn FROM cusum
)
SELECT strftime(DATE '1970-01-01' + CAST(ed AS INTEGER), '%Y-%m-%d')
         AS changepoint_day,
       n AS n_days,
       CAST(cusum AS VARCHAR) AS cusum_scaled
FROM pick WHERE rn = 1
"""


# -- x_mad_outliers: median/MAD robust outlier gate --------------------------

MAD_K = 5  # |x - median| > K * MAD flags an outlier


def x_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier count on daily revenue: median and MAD (median of
    absolute deviations) via the distinct-value-histogram order
    statistic, then count days with |c − median| > 5·MAD — the
    outlier gate that, unlike z-scores, a single spike cannot poison.
    """
    # the corpus aggregation is consumed by BOTH median passes and the
    # final deviation count — lazily pinned so the orders scan runs once
    # (it materializes inside the first broadcast job; the r07 work
    # profile showed 4 full re-executions, 30 jobs)
    daily = _daily(spark, sf_dir).localCheckpoint(eager=False)

    def hist_median(df: DataFrame, col: str) -> DataFrame:
        hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        wc = (
            Window.orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = hist.withColumn("cum", F.sum("cnt").over(wc))
        # row count FROM the histogram (n = Σcnt exactly), not a second
        # pass over the input (guide §1.2)
        tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
        return (
            cum.crossJoin(F.broadcast(tot))
            .agg(
                F.min(
                    F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col(col))
                ).alias("m")
            )
        )

    med = hist_median(daily, "c")
    # lazily pinned: dev feeds the MAD median's histogram, its total AND
    # the final deviation count — unpinned, the c-median window chain was
    # re-planned (and re-executed) once per reference
    dev = (
        daily.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("c") - F.col("m")).alias("ad"), "c", "m")
        .localCheckpoint(eager=False)
    )
    mad = hist_median(dev.select("ad"), "ad").withColumnRenamed("m", "mad")
    return (
        dev.crossJoin(F.broadcast(mad))
        .groupBy("m", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                F.when(F.col("ad") > MAD_K * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("m").alias("median_cents"),
            F.col("mad").alias("mad_cents"),
            "n_days",
            "n_outliers",
        )
    )


X_MAD_SQL = f"""
WITH {_DAILY_SQL},
h1 AS (SELECT c, COUNT(*) AS cnt FROM daily GROUP BY c),
c1 AS (SELECT c, SUM(cnt) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
       AND CURRENT ROW) AS cum FROM h1),
t1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
med AS (SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS m
        FROM c1 CROSS JOIN t1),
dev AS (SELECT ABS(d.c - med.m) AS ad, d.c, med.m FROM daily d CROSS JOIN med),
h2 AS (SELECT ad, COUNT(*) AS cnt FROM dev GROUP BY ad),
c2 AS (SELECT ad, SUM(cnt) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING
       AND CURRENT ROW) AS cum FROM h2),
mad AS (SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN ad END) AS mad
        FROM c2 CROSS JOIN t1)
SELECT dev.m AS median_cents, mad.mad AS mad_cents,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN dev.ad > {MAD_K} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev CROSS JOIN mad
GROUP BY dev.m, mad.mad
"""


QUERIES["x_autocorrelation"] = x_autocorrelation
ORACLES["x_autocorrelation"] = X_AUTOCORRELATION_SQL
QUERIES["x_cusum_changepoint"] = x_cusum_changepoint
ORACLES["x_cusum_changepoint"] = X_CUSUM_SQL
QUERIES["x_mad_outliers"] = x_mad_outliers
ORACLES["x_mad_outliers"] = X_MAD_SQL
