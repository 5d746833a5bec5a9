"""Concentration and engagement metrics: revenue Gini / top-decile share,
and DAU/WAU stickiness.

The reference (kerighan/kinbaku) has no aggregation surface (SURVEY.md
§2.4); these extend the BI layer on `orders` and `events`.

Shuffle shapes (the 100 TB story):

- revenue concentration: the fact table collapses to one row PER CUSTOMER
  first (map-side partials), so the rank window runs over the customer
  aggregate, not raw orders; the Gini moments are one more scalar
  aggregate. At 100 TB the customer table is the small side by
  construction.
- stickiness: (user, day) presence dedup is the only fact-sized shuffle;
  DAU is a count over it; WAU joins the tiny day spine against presence
  with a bounded 7-day range fan-out (each presence row lands in ≤ 7
  windows) — never a distinct-over-sliding-window state explosion.

Determinism: revenue in integer cents; Gini from the exact integer
formula G = (2·Σ(rank·x))/(n·Σx) − (n+1)/n rendered in ppm via integer
div on wide integers (Spark DECIMAL(38,0) / DuckDB HUGEINT); ranks break
ties on customer id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.operators.rank import ranked as dist_ranked
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_revenue_concentration: Gini + top-decile share ------------------------

def x_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue inequality: exact Gini coefficient and the
    revenue share of the top decile of customers, in integer ppm — the
    80/20 concentration readout behind account prioritization and
    abuse/whale detection.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    # exact global rank without a single-partition window (rank.py);
    # lazily pinned — TWO consumers (the moment aggregate and the
    # top-decile filter) would otherwise each re-run the rank fan-out
    # (r07 work profile: 21 jobs for this query, half of them duplicates)
    ranked = dist_ranked(
        per_cust, [F.col("cents"), F.col("o_custkey")], "rank"
    ).localCheckpoint(eager=False)
    d38 = "decimal(38,0)"
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("cents").cast(d38)).cast("long").alias("total_cents"),
        F.sum((F.col("rank").cast(d38) * F.col("cents").cast(d38)))
        .cast(d38)
        .alias("srx"),
        # top decile = the ceil(n/10) highest-revenue customers
        F.max("rank").alias("nmax"),
    )
    topk = ranked.crossJoin(
        F.broadcast(mom.select(F.expr("(nmax * 9) div 10").alias("cut")))
    ).where(F.col("rank") > F.col("cut"))
    top = topk.agg(
        F.sum(F.col("cents").cast(d38)).cast("long").alias("top_cents")
    )
    gini_ppm = F.expr(
        "CAST(2 AS DECIMAL(38,0)) * srx * 1000000"
        " div (CAST(n_customers AS DECIMAL(38,0)) * total_cents)"
        " - CAST(n_customers + 1 AS DECIMAL(38,0)) * 1000000 div n_customers"
    ).cast("long")
    return (
        mom.crossJoin(top)
        .select(
            "n_customers",
            "total_cents",
            gini_ppm.alias("gini_ppm"),
            # DECIMAL numerator: cents totals scale with the corpus, and
            # top_cents * 10^6 wraps int64 near 9.2e12 total cents (~$92B
            # — well inside a 100 TB ledger; the 100x drill trips it)
            F.expr(
                "CAST(CAST(top_cents AS DECIMAL(38,0)) * 1000000"
                " div total_cents AS BIGINT)"
            ).alias("top_decile_share_ppm"),
        )
    )


X_REVENUE_CONCENTRATION_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rank FROM per_cust
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         SUM(CAST(rank AS HUGEINT) * cents) AS srx,
         MAX(rank) AS nmax
  FROM ranked
),
top AS (
  SELECT CAST(SUM(r.cents) AS BIGINT) AS top_cents
  FROM ranked r CROSS JOIN mom m
  WHERE r.rank > (m.nmax * 9) // 10
)
SELECT m.n_customers, m.total_cents,
       CAST(CAST(2 AS HUGEINT) * m.srx * 1000000
              // (CAST(m.n_customers AS HUGEINT) * m.total_cents)
            - CAST(m.n_customers + 1 AS HUGEINT) * 1000000 // m.n_customers
         AS BIGINT) AS gini_ppm,
       CAST((CAST(t.top_cents AS HUGEINT) * 1000000) // m.total_cents AS BIGINT)
         AS top_decile_share_ppm
FROM mom m CROSS JOIN top t
"""


# -- x_dau_wau_stickiness: engagement ratio ----------------------------------

def x_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day active users, and the DAU/WAU
    stickiness ratio (ppm) per day — the core engagement dashboard.

    WAU avoids sliding-window COUNT DISTINCT state: each (user, day)
    presence row is range-joined onto at most 7 day-spine rows, then a
    plain distinct count per spine day. Presence is deduped once and
    reused by both metrics.
    """
    ev = load_table(spark, sf_dir, "events")
    presence = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dau = presence.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spine = presence.select("day").distinct()
    wau = (
        spine.join(
            presence.select(F.col("user_id").alias("u"), F.col("day").alias("d")),
            (F.col("d") <= F.col("day"))
            & (F.col("d") >= F.date_sub(F.col("day"), 6)),
        )
        .select("day", "u")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("dau * 1000000 div wau").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


X_DAU_WAU_SQL = """
WITH presence AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM presence GROUP BY day
),
spine AS (SELECT DISTINCT day FROM presence),
wau AS (
  SELECT s.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
  FROM spine s JOIN presence p
    ON p.day <= s.day AND p.day >= s.day - INTERVAL 6 DAY
  GROUP BY s.day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
       CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
FROM dau d JOIN wau w USING (day)
ORDER BY d.day
"""


QUERIES["x_revenue_concentration"] = x_revenue_concentration
ORACLES["x_revenue_concentration"] = X_REVENUE_CONCENTRATION_SQL
QUERIES["x_dau_wau_stickiness"] = x_dau_wau_stickiness
ORACLES["x_dau_wau_stickiness"] = X_DAU_WAU_SQL
