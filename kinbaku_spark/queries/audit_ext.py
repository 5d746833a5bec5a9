"""Markov steady-state and Benford first-digit auditing.

The reference (kerighan/kinbaku) has no statistics surface (SURVEY.md
§2.4); these close out the behavioral/audit layer: the stationary
distribution of the event-type Markov chain (where user journeys spend
their time in the long run) and the Benford first-digit conformance
check (the classic fraud/data-fabrication screen).

Shuffle shapes (the 100 TB story):

- stationary: the transition matrix is the vocab-bounded aggregate of
  x_event_transitions (ONE user-partitioned window + tiny groupBy); the
  power iteration runs on the collected k×k integer matrix (k = event
  types, O(10)) — same collect-small-state pattern as the k-means
  centroids and PCA Gram.
- Benford: first digits are a shuffle-free projection (no string math —
  integer division by a power of 10); one 9-cell groupBy.

Determinism: transition counts are exact integers; the iteration uses
the sign-free truncating renormalization of x_pca_top_component (all
masses non-negative); Benford's expected shares enter as fixed integer
ppm literals (log10 evaluated once, offline), so conformance deltas are
exact integer arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_stationary_markov: steady state of the event-type chain ---------------

MARKOV_ROUNDS = 4
MARKOV_SCALE = 1_000_000


def x_stationary_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution of the first-order event-type
    Markov chain (4 exact-integer power rounds of p·P from uniform) —
    the long-run attention share per event type that transition
    PROBABILITIES alone don't reveal.

    The k×k transition-count matrix is collected (k = |event types|,
    single digits even at 100 TB); iteration is arbitrary-precision
    integer math: p'_j = Σ_i p_i · c_ij · S div (Σ_i p_i · row_i), with
    one truncating renormalization per round — replayed verbatim by the
    oracle's CTE chain in HUGEINT.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    types = sorted({r["cur"] for r in counts} | {r["nxt"] for r in counts})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    c = [[0] * k for _ in range(k)]
    for r in counts:
        c[idx[r["cur"]]][idx[r["nxt"]]] = int(r["n"])
    rowsum = [sum(row) for row in c]
    p = [MARKOV_SCALE] * k  # uniform, un-normalized (scale-free)
    for _ in range(MARKOV_ROUNDS):
        # mass into j: Σ_i p_i * c_ij / rowsum_i — kept exact by putting
        # everything over the common denominator Π rowsum? (overflows) —
        # instead: integer per-source split with truncation, the same
        # rule both engines replay: share_ij = p_i * c_ij div rowsum_i
        nxt = [0] * k
        for i in range(k):
            if rowsum[i] == 0:
                continue
            for j in range(k):
                if c[i][j]:
                    nxt[j] += (p[i] * c[i][j]) // rowsum[i]
        m = sum(nxt)
        if m == 0:  # no transitions at all (empty events): keep current p
            break   # instead of ZeroDivisionError; oracle yields empty too
        p = [(x * MARKOV_SCALE) // m for x in nxt]
    return spark.createDataFrame(
        sorted(zip(types, p)), "event_type string, stationary_ppm long"
    )


def _stationary_sql() -> str:
    sql = """
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
),
c AS (
  SELECT cur, nxt, CAST(COUNT(*) AS HUGEINT) AS n
  FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt
),
rowsum AS (SELECT cur, SUM(n) AS rs FROM c GROUP BY cur),
types AS (SELECT DISTINCT cur AS t FROM c UNION SELECT DISTINCT nxt FROM c),
p0 AS (SELECT t, CAST(1000000 AS HUGEINT) AS p FROM types)
"""
    prev = "p0"
    for r in range(1, MARKOV_ROUNDS + 1):
        sql += f""",
n{r} AS (
  SELECT c.nxt AS t, SUM((p.p * c.n) // rs.rs) AS mass
  FROM c JOIN {prev} p ON p.t = c.cur JOIN rowsum rs ON rs.cur = c.cur
  GROUP BY c.nxt
),
f{r} AS (
  SELECT ty.t, COALESCE(n.mass, 0) AS mass
  FROM types ty LEFT JOIN n{r} n ON n.t = ty.t
),
p{r} AS (
  SELECT t, (mass * 1000000) // (SELECT SUM(mass) FROM f{r}) AS p FROM f{r}
)"""
        prev = f"p{r}"
    sql += f"""
SELECT t AS event_type, CAST(p AS BIGINT) AS stationary_ppm
FROM {prev}
ORDER BY event_type
"""
    return sql


# -- x_benford_check: first-digit conformance --------------------------------

# Benford expected shares, ppm (log10(1+1/d), evaluated offline once —
# fixed literals, so both engines do pure integer arithmetic)
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def x_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: observed first-digit
    shares vs the expected log distribution (fixed ppm literals), with
    per-digit deviation — the classic fabricated-data screen. First
    digits come from integer division (value div 10^floor(log10) — here
    via repeated division, no string parsing).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"))
    # leading digit = c / 10^floor(log10 c): both engines' log10 is exact
    # on powers of ten (the only floor-flip boundary), and a chained
    # when-per-digit unroll would duplicate the subtree 3^depth times in
    # the Catalyst tree — the closed form stays one expression
    digits = cents.where(F.col("c") >= 1).select(
        (F.col("c") / F.pow(F.lit(10.0), F.floor(F.log10("c"))))
        .cast("long")
        .alias("digit")
    )
    exp_expr = "CASE digit " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in BENFORD_PPM.items()
    ) + " END"
    w = Window.partitionBy()
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tot", F.sum("n").over(w))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 div tot").alias("observed_ppm"),
            F.expr(exp_expr).cast("long").alias("benford_ppm"),
            F.expr(f"abs(n * 1000000 div tot - ({exp_expr}))")
            .cast("long")
            .alias("deviation_ppm"),
        )
        .orderBy("digit")
    )


def _benford_sql() -> str:
    exp_expr = "CASE digit " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in BENFORD_PPM.items()
    ) + " END"
    return f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
digits AS (
  -- NOT `c // power(...)`: DuckDB's // with a DOUBLE divisor rounds the
  -- quotient instead of flooring it (int is cast to double, then the
  -- integer-division cast rounds) — explicit floor() matches Spark's
  -- truncating long cast on non-negative quotients
  SELECT CAST(floor(c / power(10, CAST(floor(log10(c)) AS BIGINT))) AS BIGINT)
           AS digit
  FROM cents WHERE c >= 1
),
agg AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
)
SELECT CAST(digit AS INTEGER) AS digit, n,
       CAST((n * 1000000) // SUM(n) OVER () AS BIGINT) AS observed_ppm,
       CAST({exp_expr} AS BIGINT) AS benford_ppm,
       CAST(ABS((n * 1000000) // SUM(n) OVER () - ({exp_expr})) AS BIGINT)
         AS deviation_ppm
FROM agg
ORDER BY digit
"""


QUERIES["x_stationary_markov"] = x_stationary_markov
ORACLES["x_stationary_markov"] = _stationary_sql()
QUERIES["x_benford_check"] = x_benford_check
ORACLES["x_benford_check"] = _benford_sql()
