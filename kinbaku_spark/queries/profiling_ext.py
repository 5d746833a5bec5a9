"""Profiling and time-series-completion operators: calendar gap-fill with
forward-fill, equi-width value histograms, and shortest-path (geodesic)
counting — the Brandes forward pass.

The reference (kerighan/kinbaku) has no aggregation/window surface
(SURVEY.md §2.4) and its only path primitive is one-hop traversal; these
extend the analytics surface on `events` / `lineitem` and the derived
supplier→part graph.

Shuffle shapes (the 100 TB story):

- gap-fill: ONE groupBy(event_type, hour) with map-side partials collapses
  the raw events; the calendar scaffold is a types x hours cross join of
  two tiny inputs (types O(10), hours O(10^4) even for a year) — the
  fact table is never joined against itself; the forward-fill window
  repartitions only the O(types x hours) scaffold.
- histogram: min/max is one all-partial aggregate broadcast back via
  crossJoin (no global window over the fact table); bucketing is a
  shuffle-free projection; the final groupBy has 20 output rows.
- geodesic counts: per-round frontier join + (key)-sum aggregation — the
  distributed Brandes sigma forward pass; each round touches only the
  frontier, lineage is truncated per round (localCheckpoint), and sigma
  sums are exact BIGINTs (order-free).

Determinism: histogram bucketing runs on integer cents with integer div
(both engines floor identically); gap-filled sums go through the
DECIMAL(18,6) route (relational.py header); sigma is integer path
counting, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.queries.graph_queries import GRAPH_CTE
from kinbaku_spark.queries.relational import _dsum
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_gap_fill_ffill: hourly series completion with forward fill ------------

def x_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type hourly series on a complete calendar: hours with no
    events appear with n_events=0, gap=true, and the running value
    carried forward from the last observed hour (the standard
    time-series regularization before any rolling-window model).

    The scaffold (types x hours) is built from two one-row aggregates —
    the events table is scanned exactly once for the hourly rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("value").alias("sv"),
    )
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    scaffold = types.crossJoin(hours)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scaffold.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.last("sv", ignorenulls=True).over(w).alias("sum_value_filled"),
            F.col("n").isNull().alias("gap"),
        )
        .orderBy("event_type", "hr")
    )


X_GAP_FILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
scaffold AS (
  SELECT t.event_type, h.hr
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
              FROM span) h
)
SELECT s.event_type, s.hr,
       COALESCE(h.n, 0) AS n_events,
       last_value(h.sv IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_filled,
       h.n IS NULL AS gap
FROM scaffold s LEFT JOIN hourly h
  ON h.event_type = s.event_type AND h.hr = s.hr
ORDER BY s.event_type, s.hr
"""


# -- x_value_histogram: equi-width price histogram ---------------------------

HIST_BUCKETS = 20


def x_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice in 20 buckets — the
    profiling primitive behind optimizer statistics and data-drift
    monitors.

    Prices are quantized to integer cents first, so the bucket rule is
    pure integer arithmetic ((cents-min)*K div width) and both engines
    floor identically; the min/max pass broadcasts one row back.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    stats = cents.agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    return (
        cents.crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"(c - mn) * {HIST_BUCKETS} div (mx - mn + 1)").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .withColumn(
            "share_ppm",
            F.expr("n_items * 1000000 div sum(n_items) over ()"),
        )
        .orderBy("bucket")
    )


X_VALUE_HISTOGRAM_SQL = f"""
WITH cents AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
),
stats AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM cents),
bucketed AS (
  SELECT ((c - mn) * {HIST_BUCKETS}) // (mx - mn + 1) AS bucket
  FROM cents CROSS JOIN stats
),
agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_items FROM bucketed GROUP BY bucket
)
SELECT bucket, n_items,
       CAST((n_items * 1000000) // SUM(n_items) OVER () AS BIGINT) AS share_ppm
FROM agg
ORDER BY bucket
"""


# -- g_geodesic_counts: shortest-path counting (Brandes forward pass) --------

GEO_SOURCE = "S1"
GEO_MAX_DEPTH = 3


def geo_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Brandes forward pass (key, depth, sigma from GEO_SOURCE within
    GEO_MAX_DEPTH), built once per sf_dir and persisted as engine state —
    shared by g_geodesic_counts and g_betweenness_bounded so the
    round-per-hop BFS jobs are paid once, not once per consumer."""
    from kinbaku_spark.queries.graph_queries import _cached, und_edges

    extra = _cached(spark, sf_dir)[2]
    if "geo_fwd" not in extra:
        und = und_edges(spark, sf_dir)
        settled = spark.createDataFrame(
            [(GEO_SOURCE, 0, 1)], "key string, depth int, sigma long"
        )
        frontier = settled
        for d in range(1, GEO_MAX_DEPTH + 1):
            reached = (
                und.join(frontier.select(F.col("key").alias("u"), "sigma"), "u")
                .groupBy(F.col("v").alias("key"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            # lazy checkpoint + full count: ONE job both materializes the
            # round's frontier and answers the early-exit probe
            new = (
                reached.join(settled.select("key"), "key", "left_anti")
                .select("key", F.lit(d).cast("int").alias("depth"), "sigma")
                .localCheckpoint(eager=False)
            )
            if new.count() == 0:
                break
            settled = settled.unionByName(new)
            frontier = new
        extra["geo_fwd"] = settled.persist()
        extra["geo_fwd"].count()
    return extra["geo_fwd"]


def g_geodesic_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number of shortest paths (sigma) from S1 to every node within 3
    hops of the undirected supplier→part graph — the forward pass of
    Brandes' betweenness algorithm and the path-counting primitive of
    graph features.

    Each round: frontier ⋈ edges, then ONE sum-aggregation keyed on the
    reached node (sigma(v) = sum of sigma(u) over shortest-path
    predecessors), then an anti-join against the settled set. Only the
    frontier shuffles; sigma is exact integer counting. The pass itself
    is the session-persisted :func:`geo_forward` state, shared with
    g_betweenness_bounded's backward accumulation.
    """
    return geo_forward(spark, sf_dir).orderBy("key")


G_GEODESIC_SQL = GRAPH_CTE.replace("WITH ", "WITH RECURSIVE ", 1) + f"""
, und AS (
  SELECT src AS u, dst AS v FROM g_edges
  UNION
  SELECT dst, src FROM g_edges
),
walks AS (
  SELECT '{GEO_SOURCE}' AS key, 0 AS depth
  UNION ALL
  SELECT u.v, w.depth + 1
  FROM walks w JOIN und u ON u.u = w.key
  WHERE w.depth < {GEO_MAX_DEPTH}
),
mind AS (SELECT key, MIN(depth) AS d FROM walks GROUP BY key)
SELECT m.key, CAST(m.d AS INTEGER) AS depth, CAST(COUNT(*) AS BIGINT) AS sigma
FROM mind m JOIN walks w ON w.key = m.key AND w.depth = m.d
GROUP BY m.key, m.d
ORDER BY m.key
"""


QUERIES["x_gap_fill_ffill"] = x_gap_fill_ffill
ORACLES["x_gap_fill_ffill"] = X_GAP_FILL_SQL
QUERIES["x_value_histogram"] = x_value_histogram
ORACLES["x_value_histogram"] = X_VALUE_HISTOGRAM_SQL
QUERIES["g_geodesic_counts"] = g_geodesic_counts
ORACLES["g_geodesic_counts"] = G_GEODESIC_SQL
