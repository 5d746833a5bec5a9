"""Deterministic Poisson bootstrap confidence interval and tokenizer
vocab-size coverage sweep.

The reference (kerighan/kinbaku) has no statistics surface (SURVEY.md
§2.4); these extend the stats / tokenizer-planning families.

- bootstrap: the scale-correct resampling scheme — per replica, every
  row draws a Poisson(1) multiplicity from a DETERMINISTIC hash (the
  streaming-bootstrap trick: multiplicities are i.i.d.-ish across rows,
  no global sample-n-of-n pass), so B replica means come from ONE
  corpus scan with a ×B map-side fan-out and a B-group aggregate.
  Map-side partials collapse each partition to ≤ B rows before the
  exchange; the order-statistic CI runs over the B-row aggregate.
- vocab sweep: token-occurrence coverage of the top-S vocabulary at
  several S cutoffs — the readout that sizes a tokenizer's vocab. ONE
  tokenize + count shuffle (vocab-bounded), one rank window over the
  type table, then a threshold × type broadcast join aggregates all
  cutoffs in one pass (never one scan per cutoff).

Determinism: revenue in integer cents, replica means via truncating
integer div; Poisson multiplicities from the shared 60-bit md5 hash
mod 10⁴ against fixed pmf thresholds (3679/7358/9197/9810/9963 — the
Poisson(1) CDF in basis points); coverage in integer ppm; ranks break
ties lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.functions.hashing import (
    HASH_PRIME,
    minhash_coeffs,
    sql_md5_long,
)
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_bootstrap_ci: deterministic Poisson bootstrap of mean order value ------

BOOT_B = 16
# Poisson(1) CDF in basis points: P(X<=k) for k = 0..4; h >= 9963 -> 5
_POIS_EDGES = [3679, 7358, 9197, 9810, 9963]


def _pois_weight_spark(h) -> object:
    w = F.lit(5)
    for k in range(len(_POIS_EDGES) - 1, -1, -1):
        w = F.when(h < _POIS_EDGES[k], k).otherwise(w)
    return w


def _pois_weight_sql(h: str) -> str:
    expr = "5"
    for k in range(len(_POIS_EDGES) - 1, -1, -1):
        expr = f"CASE WHEN {h} < {_POIS_EDGES[k]} THEN {k} ELSE {expr} END"
    return expr


def x_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap CI for the mean order value: `BOOT_B` Poisson-bootstrap
    replicas (each order's multiplicity per replica is Poisson(1) drawn
    from a deterministic hash), replica means in truncated integer
    cents, and the [2nd, B-1th] order-statistic interval (≈ 90% CI at
    B=16) — the uncertainty readout behind any corpus-level mean metric.

    One row out: replica count, mean of replica means, CI bounds.
    """
    o = load_table(spark, sf_dir, "orders")
    # ONE md5 per row, then a universal hash per replica — 16 integer ops
    # instead of 16 md5s on the ×B fan-out (the MinHash coefficient trick)
    base = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % HASH_PRIME
        ).alias("h0"),
    )
    coeffs = minhash_coeffs(BOOT_B, seed=77)
    fan = base.select(
        "cents",
        "h0",
        F.explode(F.array(*[F.lit(b) for b in range(BOOT_B)])).alias("b"),
    )
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    c_arr = F.array(*[F.lit(c).cast("long") for _, c in coeffs])
    hb = (
        F.element_at(a_arr, F.col("b") + 1) * F.col("h0")
        + F.element_at(c_arr, F.col("b") + 1)
    ) % HASH_PRIME % 10000
    w = _pois_weight_spark(hb)
    reps = (
        fan.select("b", (w * F.col("cents")).alias("wc"), w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("wc").cast("long").alias("twc"),
            F.sum("w").cast("long").alias("tw"),
        )
        .select("b", F.expr("twc div tw").alias("mean_cents"))
    )
    ranked = reps.select(
        "mean_cents",
        F.row_number()
        .over(Window.orderBy("mean_cents", "b"))
        .alias("rk"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.expr("CAST(sum(mean_cents) AS BIGINT) div count(1)").alias(
            "mean_of_means_cents"
        ),
        F.max(F.when(F.col("rk") == 2, F.col("mean_cents"))).alias(
            "ci_lo_cents"
        ),
        F.max(
            F.when(F.col("rk") == BOOT_B - 1, F.col("mean_cents"))
        ).alias("ci_hi_cents"),
    ).where(F.col("n_replicas") > 0)


_BOOT_COEFFS = minhash_coeffs(BOOT_B, seed=77)
_BOOT_VALUES = ", ".join(
    f"({b}, {a}, {c})" for b, (a, c) in enumerate(_BOOT_COEFFS)
)
_BOOT_HB = f"(co.a * base.h0 + co.c) % {HASH_PRIME} % 10000"

X_BOOTSTRAP_SQL = f"""
WITH base AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
         {sql_md5_long("CAST(o_orderkey AS VARCHAR)")} % {HASH_PRIME} AS h0
  FROM orders
),
co AS (SELECT * FROM (VALUES {_BOOT_VALUES}) AS t(b, a, c)),
weighted AS (
  SELECT co.b, base.cents, {_pois_weight_sql('(' + _BOOT_HB + ')')} AS w
  FROM base CROSS JOIN co
),
reps AS (
  SELECT b, CAST(SUM(w * cents) AS BIGINT) // CAST(SUM(w) AS BIGINT)
              AS mean_cents
  FROM weighted GROUP BY b
),
ranked AS (
  SELECT mean_cents,
         ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rk
  FROM reps
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
       CAST(CAST(SUM(mean_cents) AS BIGINT) // COUNT(*) AS BIGINT)
         AS mean_of_means_cents,
       CAST(MAX(CASE WHEN rk = 2 THEN mean_cents END) AS BIGINT)
         AS ci_lo_cents,
       CAST(MAX(CASE WHEN rk = {BOOT_B - 1} THEN mean_cents END) AS BIGINT)
         AS ci_hi_cents
FROM ranked
HAVING COUNT(*) > 0
"""


# -- x_vocab_size_sweep: token coverage at candidate vocab sizes --------------

VOCAB_CUTS = [100, 500, 1000, 2000]


def x_vocab_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of token OCCURRENCES covered by the top-S word types, for
    each candidate vocab size S — the tokenizer-sizing curve (what OOV
    rate does a 1k vocab buy?). One tokenize-count pass; every cutoff
    aggregates the same ranked type table.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # only ranks <= max cutoff matter for coverage: distributed top-k
    # (TakeOrderedAndProject), THEN a k-bounded rank window — never a
    # global single-partition sort of the full type table
    top = counts.orderBy(F.desc("cnt"), "word").limit(max(VOCAB_CUTS))
    ranked_top = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "word"))
        .alias("rk"),
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_types"),
    )
    cuts = spark.createDataFrame(
        [(s,) for s in VOCAB_CUTS], "vocab_size int"
    )
    covered = (
        ranked_top.crossJoin(F.broadcast(cuts))
        .groupBy("vocab_size")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("rk") <= F.col("vocab_size"), F.col("cnt"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("covered")
        )
    )
    return (
        covered.crossJoin(F.broadcast(totals))
        .select(
            "vocab_size",
            "covered",
            "total",
            "n_types",
            F.expr(
                "CAST(CAST(covered AS DECIMAL(38,0)) * 1000000"
                " div total AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("vocab_size")
    )


X_VOCAB_SWEEP_SQL = f"""
WITH counts AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM documents
  ) GROUP BY word
),
top AS (SELECT word, cnt FROM counts ORDER BY cnt DESC, word
        LIMIT {max(VOCAB_CUTS)}),
ranked_top AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rk FROM top
),
totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM counts
),
cuts AS (SELECT unnest([{", ".join(str(s) for s in VOCAB_CUTS)}]) AS vocab_size),
covered AS (
  SELECT c.vocab_size,
         CAST(COALESCE(SUM(r.cnt) FILTER (WHERE r.rk <= c.vocab_size), 0)
              AS BIGINT) AS covered
  FROM ranked_top r CROSS JOIN cuts c
  GROUP BY c.vocab_size
)
SELECT v.vocab_size, v.covered, t.total, t.n_types,
       CAST(CAST(v.covered AS HUGEINT) * 1000000 // t.total AS BIGINT)
         AS coverage_ppm
FROM covered v CROSS JOIN totals t
ORDER BY v.vocab_size
"""


QUERIES["x_bootstrap_ci"] = x_bootstrap_ci
ORACLES["x_bootstrap_ci"] = X_BOOTSTRAP_SQL
QUERIES["x_vocab_size_sweep"] = x_vocab_size_sweep
ORACLES["x_vocab_size_sweep"] = X_VOCAB_SWEEP_SQL
