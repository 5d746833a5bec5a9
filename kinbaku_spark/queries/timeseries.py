"""Time-series / product-analytics operators the reference lacks entirely
(SURVEY.md §2.4 — no time surface, no windows, no aggregation): staged
funnel conversion, gap-filled hourly series with forward-fill, moving
window aggregates, and an equi-depth histogram.

Shuffle shapes (the 100 TB story):

- funnel: three conditional MIN aggregations all keyed on user_id — one
  hash shuffle; the per-stage tables are per-user (tiny vs the event
  stream) and join broadcast. No self-join of the raw stream.
- gap-fill: the dense spine is GENERATED (sequence/explode), never scanned
  — types x hours is O(cardinality), independent of fact size; the fact
  side collapses to one groupBy before the join, so the left join is
  dim-sized on both sides.
- moving agg: one groupBy day (map-side partial) then ONE window sort over
  ~thousands of day rows — window runs after the reduce, on the
  aggregate, never over raw facts.
- equi-depth histogram: ntile over the global sort; at 100 TB replace
  with approx_percentile bounds — kept exact here because the oracle is
  exact. Single range-partitioned sort, no shuffle after.

Determinism: double sums via DECIMAL(18,6) (then cast back), time math on
microsecond-exact timestamps, integer divisions, ties broken on unique ids
(event_id / o_orderkey); ntile's floor-division bucket sizing is identical
in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.operators.rank import with_ntile
from kinbaku_spark.sources.tables import load_table

DEC = "decimal(18,6)"


# -- staged funnel: view -> click -> purchase ---------------------------------

def x_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AT/AFTER their first
    view, then purchased at/after that first qualifying click. Classic
    product-analytics staged conversion (strictly ordered, not mere
    event-type presence).

    Each stage is a conditional MIN per user over events already filtered
    to the 3 relevant types; stages chain through broadcast joins of the
    per-user stage tables (|users| rows, tiny vs the stream).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    us = F.unix_micros(F.col("ts"))
    ev = ev.select("user_id", "event_type", us.alias("us"))

    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("us") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("us") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    stages = (
        v.agg(F.count(F.lit(1)).alias("users"), F.lit("1_view").alias("stage"))
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("users"), F.lit("2_click").alias("stage"))
        )
        .unionByName(
            p.agg(
                F.count(F.lit(1)).alias("users"), F.lit("3_purchase").alias("stage")
            )
        )
    )
    return stages.select("stage", "users").orderBy("stage")


X_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('view','click','purchase')
),
v AS (
  SELECT user_id, MIN(us) AS t_view FROM ev WHERE event_type='view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.us) AS t_click
  FROM ev e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type='click' AND e.us >= v.t_view GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.us) AS t_purchase
  FROM ev e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type='purchase' AND e.us >= c.t_click GROUP BY 1
)
SELECT '1_view' AS stage, COUNT(*) AS users FROM v
UNION ALL SELECT '2_click', COUNT(*) FROM c
UNION ALL SELECT '3_purchase', COUNT(*) FROM p
ORDER BY stage
"""


# -- gap-filled hourly series with zero- and forward-fill ---------------------

def x_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly revenue series per event_type over the stream's full
    time range: hours with no events appear with rev_filled=0 and the
    last observed hourly revenue carried forward (last_rev).

    The spine is generated with sequence()/explode from the global
    (min,max) hour — O(types x hours) rows regardless of fact volume —
    and the fact side is pre-aggregated, so the left join touches only
    aggregate-sized inputs. TimescaleDB calls this time_bucket_gapfill +
    locf; Spark needs no built-in.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("value").cast(DEC).alias("v"),
        )
        .groupBy("event_type", "hour")
        .agg(F.sum("v").cast("double").alias("rev"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .withColumn("rev_filled", F.coalesce("rev", F.lit(0.0)))
        .withColumn("last_rev", F.last("rev", ignorenulls=True).over(w))
        .select("event_type", "hour", "rev", "rev_filled", "last_rev")
        .orderBy("event_type", "hour")
    )


X_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
spine AS (
  SELECT t.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
  ) h
)
SELECT s.event_type, s.hour, hourly.rev,
       COALESCE(hourly.rev, 0.0) AS rev_filled,
       LAST_VALUE(hourly.rev IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_rev
FROM spine s LEFT JOIN hourly ON hourly.event_type = s.event_type
                             AND hourly.hour = s.hour
ORDER BY s.event_type, s.hour
"""


# -- moving-window aggregates over the daily revenue series -------------------

def x_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving sum/avg of daily order revenue. The window
    runs over the already-reduced daily series (thousands of rows), never
    the raw facts; sums stay DECIMAL inside the frame, and the moving
    average is one exact double division at the end.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.col("o_totalprice").cast(DEC).alias("p"),
        )
        .groupBy("day")
        .agg(F.sum("p").alias("rev_dec"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return (
        daily.withColumn("sum7_dec", F.sum("rev_dec").over(w))
        .withColumn("cnt7", F.count(F.lit(1)).over(w))
        .select(
            "day",
            F.col("rev_dec").cast("double").alias("rev"),
            F.col("sum7_dec").cast("double").alias("sum7"),
            "cnt7",
            (F.col("sum7_dec").cast("double") / F.col("cnt7")).alias("ma7"),
        )
        .orderBy("day")
    )


X_MOVING_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM orders GROUP BY 1
),
win AS (
  SELECT day, rev_dec,
         SUM(rev_dec) OVER w AS sum7_dec,
         COUNT(*) OVER w AS cnt7
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(rev_dec AS DOUBLE) AS rev, CAST(sum7_dec AS DOUBLE) AS sum7,
       cnt7, CAST(sum7_dec AS DOUBLE) / cnt7 AS ma7
FROM win ORDER BY day
"""


# -- equi-depth histogram via ntile -------------------------------------------

def x_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-depth histogram of order totals: exact NTILE over
    the global (o_totalprice, o_orderkey) sort, then per-bucket count and
    bounds. ntile's floor-division sizing is engine-identical; the unique
    key tiebreak makes bucket assignment fully deterministic.

    The bucket assignment is the exact distributed ntile
    (operators/rank.py: range-parallel rank + broadcast total) — the
    exact global semantics WITHOUT a single-partition window, so the
    same plan holds at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        with_ntile(
            orders.select("o_totalprice", "o_orderkey"),
            10,
            [F.col("o_totalprice"), F.col("o_orderkey")],
            "bucket",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


X_HISTOGRAM_SQL = """
SELECT bucket, COUNT(*) AS cnt, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
GROUP BY bucket ORDER BY bucket
"""


QUERIES = {
    "x_funnel_conversion": x_funnel_conversion,
    "x_gapfill": x_gapfill,
    "x_moving_agg": x_moving_agg,
    "x_histogram_equidepth": x_histogram_equidepth,
}
ORACLES = {
    "x_funnel_conversion": X_FUNNEL_SQL,
    "x_gapfill": X_GAPFILL_SQL,
    "x_moving_agg": X_MOVING_SQL,
    "x_histogram_equidepth": X_HISTOGRAM_SQL,
}
