"""Optimizer-statistics operators: join-size estimation from key-count
sketches — the cardinality-estimation primitive behind join reordering
and shuffle sizing decisions.

The reference (kerighan/kinbaku) has no optimizer at all (SURVEY.md §4.1
— it executes exactly what the caller asks); Spark's CBO keeps these
statistics internally, and this operator surfaces the same computation
as a queryable readout: the exact self-join size Σₖ n(k)² of lineitem on
l_partkey (the quantity AGM bounds and join planners reason about),
next to a hash-sampled estimate and its relative error.

Shuffle shape (the 100 TB story): ONE groupBy(key) with map-side
partials; both the exact and the sampled sums aggregate the SAME
key-count table (the sample filter is a hash predicate on the key, so
at scale you'd compute ONLY the sampled branch — 1/S of the keys —
which is the point of the estimator).

Determinism: the sample is keys with md5(key) mod `SAMPLE_MOD` == 0
(the shared 60-bit hash, never engine RNG); sums in wide integers;
relative error in integer ppm of the exact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

SAMPLE_MOD = 8  # 1/8 of keys land in the sample


def x_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs key-sampled self-join cardinality of lineitem on
    l_partkey: exact = Σₖ n(k)², estimate = SAMPLE_MOD · Σ_{sampled k}
    n(k)². One row: both sizes, the signed error in ppm of exact, and
    the key counts behind them.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    sampled = (
        md5_long(F.col("l_partkey").cast("string")) % SAMPLE_MOD == 0
    )
    d38 = "decimal(38,0)"
    agg = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("long").alias(
            "n_sampled_keys"
        ),
        F.sum((F.col("n").cast(d38) * F.col("n"))).cast(d38).alias("exact"),
        (
            F.sum(
                F.when(sampled, F.col("n").cast(d38) * F.col("n")).otherwise(
                    F.lit(0).cast(d38)
                )
            )
            * SAMPLE_MOD
        )
        .cast(d38)
        .alias("est"),
    )
    return agg.filter(F.col("n_keys") > 0).select(
        "n_keys",
        "n_sampled_keys",
        F.col("exact").cast("long").alias("exact_size"),
        F.col("est").cast("long").alias("est_size"),
        F.expr(
            "CAST((est - exact) * 1000000 div exact AS BIGINT)"
        ).alias("err_ppm"),
    )


X_JOIN_SIZE_SQL = f"""
WITH per_key AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COUNT(*) FILTER (
           WHERE {sql_md5_long("CAST(l_partkey AS VARCHAR)")} % {SAMPLE_MOD} = 0
         ) AS BIGINT) AS n_sampled_keys,
         SUM(CAST(n AS HUGEINT) * n) AS exact,
         SUM(CASE WHEN {sql_md5_long("CAST(l_partkey AS VARCHAR)")}
                       % {SAMPLE_MOD} = 0
                  THEN CAST(n AS HUGEINT) * n ELSE 0 END)
           * {SAMPLE_MOD} AS est
  FROM per_key
)
SELECT n_keys, n_sampled_keys,
       CAST(exact AS BIGINT) AS exact_size,
       CAST(est AS BIGINT) AS est_size,
       CAST((est - exact) * 1000000 // exact AS BIGINT) AS err_ppm
FROM agg
WHERE n_keys > 0
"""


QUERIES["x_join_size_estimate"] = x_join_size_estimate
ORACLES["x_join_size_estimate"] = X_JOIN_SIZE_SQL
