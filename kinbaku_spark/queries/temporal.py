"""Temporal join operators + sketch aggregates the reference lacks entirely
(SURVEY.md §2.4 — no join or time surface of any kind): as-of join, range
(interval) join, and a deterministic KMV distinct-count sketch.

These are the classic "Spark has no built-in for this" operators; each is
expressed as a composition of DataFrame ops chosen for its SHUFFLE SHAPE at
scale, not row-at-a-time logic:

- as-of join: union-then-window (one shuffle on the key, sort-merge within
  partition) instead of the naive inequality join, whose per-key cross
  product is quadratic.
- range join: bin the time axis and equi-join on (key, bin) so Catalyst
  gets a hash join; the interval length equals the bin width, so every
  interval spans exactly 2 bins — a bounded 2x fan-out replaces the
  unbounded inequality-join explosion (the same trick Databricks' range
  join hints apply).
- KMV sketch: distinct-count estimation from the k smallest hashes —
  mergeable (union of sketches = sketch of union), O(k) state per group.
  Hashing is the shared 60-bit md5 prefix (functions/hashing.py) so the
  DuckDB oracle replays it bit-exactly; estimates are therefore
  deterministic, unlike approx_count_distinct's HLL whose internals differ
  across engines.

Determinism: all time math in integer microseconds (unix_micros ≡
epoch_us, see FIXTURES.md); double sums via DECIMAL(18,6); the as-of lag
average is FLOOR(µs) — identical IEEE double ops both engines, no
decimal-ROUND boundary (engines' ROUND impls diverge by 1 ulp on exact
halves); 63 * 2^60 is exactly representable in double (6-bit
significand), so the KMV estimate divides identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.functions.hashing import md5_long, sql_md5_long
from kinbaku_spark.sources.tables import load_table

DEC = "decimal(18,6)"


# -- as-of join: purchase -> most recent preceding click ----------------------

def x_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each purchase to the same user's most recent click at or
    before it (classic attribution as-of join; reference has no joins at
    all, SURVEY.md §2.4).

    Plan shape: filter both sides, UNION, one window over
    (user_id ORDER BY us, event_id) carrying the last non-null click
    timestamp forward — a single hash shuffle on user_id plus an in-
    partition sort. The naive formulation (inequality join + per-purchase
    argmax) shuffles both sides AND builds a per-user cross product; at
    100 TB the union-window form is the only one that survives skewed
    users. Ties at identical microseconds break on event_id (click first
    iff lower id), identical in both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    us = F.unix_micros(F.col("ts"))
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        us.alias("us"),
        F.when(F.col("event_type") == "click", us).alias("click_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.withColumn(
        "last_click_us", F.last("click_us", ignorenulls=True).over(w)
    )
    lag_us = F.col("us") - F.col("last_click_us")
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("last_click_us").alias("n_attributed"),
            F.floor(
                F.sum(lag_us).cast("double") / F.count("last_click_us")
            )
            .cast("long")
            .alias("avg_lag_us"),
            F.sum(
                F.when(
                    F.col("last_click_us").isNotNull(), F.col("value")
                ).cast(DEC)
            )
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("user_id")
    )


X_ASOF_JOIN_SQL = """
WITH ce AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
  FROM events
  WHERE event_type IN ('click', 'purchase')
), enr AS (
  SELECT *,
         LAST_VALUE(click_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
  FROM ce
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       COUNT(last_click_us) AS n_attributed,
       CAST(FLOOR(CAST(SUM(us - last_click_us) AS DOUBLE)
                  / COUNT(last_click_us)) AS BIGINT) AS avg_lag_us,
       CAST(SUM(CASE WHEN last_click_us IS NOT NULL
                     THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
         AS attributed_value
FROM enr
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
"""


# -- range join: follow-up events inside a 10-minute incident window ----------

BIN_US = 600_000_000  # 10 min in microseconds = interval length = bin width


def x_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: how many click/view events land inside the 10-minute
    window after each of their errors (interval join; reference has no
    joins, SURVEY.md §2.4).

    Plan shape: binned range join. Because the interval length equals the
    bin width, interval [t, t+W] intersects exactly bins {t div W,
    t div W + 1}: explode each error into those two candidate bins and
    equi-join on (user_id, bin), then apply the exact range predicate —
    Catalyst gets a shuffled hash join with a bounded 2x build fan-out
    instead of a per-user nested-loop inequality join. LEFT join keeps
    zero-follow errors. All µs math is integer-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), us.alias("err_us")
    )
    follows = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("f_user"),
        us.alias("f_us"),
        F.expr(f"unix_micros(ts) div {BIN_US}").alias("f_bin"),
    )
    cand = errors.withColumn(
        "bin",
        F.explode(
            F.array(
                F.expr(f"err_us div {BIN_US}"),
                F.expr(f"err_us div {BIN_US} + 1"),
            )
        ),
    )
    joined = cand.join(
        follows,
        (F.col("user_id") == F.col("f_user"))
        & (F.col("bin") == F.col("f_bin"))
        & (F.col("f_us") >= F.col("err_us"))
        & (F.col("f_us") <= F.col("err_us") + F.lit(BIN_US)),
        "left",
    )
    per_err = joined.groupBy("user_id", "err_id").agg(
        F.count("f_us").alias("n_follow")
    )
    return (
        per_err.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.sum("n_follow").alias("total_follows"),
            F.max("n_follow").alias("max_follows"),
        )
        .orderBy("user_id")
    )


X_RANGE_JOIN_SQL = f"""
WITH errors AS (
  SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us
  FROM events WHERE event_type = 'error'
), follows AS (
  SELECT user_id AS f_user, epoch_us(ts) AS f_us
  FROM events WHERE event_type IN ('click', 'view')
), per_err AS (
  SELECT e.user_id, e.err_id, COUNT(f.f_us) AS n_follow
  FROM errors e
  LEFT JOIN follows f
    ON f.f_user = e.user_id
   AND f.f_us >= e.err_us AND f.f_us <= e.err_us + {BIN_US}
  GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_errors,
       CAST(SUM(n_follow) AS BIGINT) AS total_follows,
       MAX(n_follow) AS max_follows
FROM per_err
GROUP BY user_id
ORDER BY user_id
"""


# -- KMV sketch: deterministic distinct-count estimate ------------------------

KMV_K = 64
TWO_60 = float(1 << 60)  # exactly representable: power of two


def x_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l_partkey per l_returnflag, estimated with a k-minimum-
    values sketch (k=64) next to the exact count (reference has no
    aggregation surface, SURVEY.md §2.4).

    KMV: hash every value uniformly into [0, 2^60); the k-th smallest
    hash h_k estimates distinct ≈ (k-1) * 2^60 / h_k. Sketches merge by
    unioning hash sets and re-truncating to k, so at 100 TB this runs as
    a map-side partial (each partition keeps its k smallest) + one tiny
    shuffle of k longs per group — versus the full shuffle of every
    distinct value the exact count needs. Here the reference plan keeps
    the exact count alongside (the test IS the comparison); groups with
    fewer than k values fall back to the exact count, the standard KMV
    small-cardinality rule. Deterministic md5-prefix hashing makes the
    estimate reproducible and oracle-checkable, unlike HLL.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_partkey")
        .distinct()
    )
    hashed = li.select(
        "l_returnflag", md5_long(F.col("l_partkey").cast("string")).alias("h")
    )
    w = Window.partitionBy("l_returnflag").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("kth"),
        F.count(F.lit(1)).alias("true_distinct"),
    )
    est = F.when(
        F.col("kth").isNull(), F.col("true_distinct").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(KMV_K - 1)) * F.lit(TWO_60) / F.col("kth").cast("double"),
            6,
        )
    )
    return agg.select(
        F.col("l_returnflag").alias("grp"),
        "true_distinct",
        est.alias("est_distinct"),
    ).orderBy("grp")


X_KMV_DISTINCT_SQL = f"""
WITH d AS (
  SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
), h AS (
  SELECT l_returnflag,
         {sql_md5_long("CAST(l_partkey AS VARCHAR)")} AS h
  FROM d
), r AS (
  SELECT l_returnflag, h,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM h
), a AS (
  SELECT l_returnflag,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS kth,
         COUNT(*) AS true_distinct
  FROM r GROUP BY 1
)
SELECT l_returnflag AS grp,
       true_distinct,
       CASE WHEN kth IS NULL THEN CAST(true_distinct AS DOUBLE)
            ELSE ROUND(CAST('{KMV_K - 1}' AS DOUBLE)
                       * CAST('{1 << 60}' AS DOUBLE)
                       / CAST(kth AS DOUBLE), 6)
       END AS est_distinct
FROM a
ORDER BY grp
"""


# -- hypertable rollup: hierarchical time-bucket aggregates -------------------

HOUR_US = 3_600_000_000


def x_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event aggregates computed FROM hourly partials — the
    TimescaleDB continuous-aggregate / hypertable-rollup pattern
    (reference has no time or aggregation surface, SURVEY.md §2.4).

    Plan shape: the hourly tier aggregates raw events once (map-side
    partial + one shuffle on (hour, type)); the daily tier then shuffles
    only |hours|x|types| partial rows, not raw events — at 100 TB the
    coarse tiers are effectively free, and columns like peak_hour_events
    / n_active_hours are only computable from the hierarchy, not from a
    flat daily groupBy. In production the hourly tier is an incremental
    materialized sink (streaming/ has the watermarked writeStream
    equivalent); here both tiers run in one plan. Bucket indices are
    integer µs divisions — exact in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("hour_idx", F.expr(f"unix_micros(ts) div {HOUR_US}"))
        .groupBy("hour_idx", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("sv"),
        )
    )
    return (
        hourly.withColumn("day_idx", F.expr("hour_idx div 24"))
        .groupBy("day_idx", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
            F.max("n").alias("peak_hour_events"),
            F.count(F.lit(1)).alias("n_active_hours"),
        )
        .orderBy("day_idx", "event_type")
    )


X_HYPERTABLE_ROLLUP_SQL = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {HOUR_US} AS hour_idx, event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sv
  FROM events
  GROUP BY 1, 2
)
SELECT hour_idx // 24 AS day_idx, event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(sv) AS DOUBLE) AS sum_value,
       MAX(n) AS peak_hour_events,
       COUNT(*) AS n_active_hours
FROM hourly
GROUP BY 1, 2
ORDER BY day_idx, event_type
"""


# -- KMV set algebra: sketch-estimated audience overlap -----------------------

EVENT_PAIRS = [
    ("click", "purchase"),
    ("view", "purchase"),
    ("error", "signup"),
]


def x_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact user-audience overlap between event types via
    KMV sketch set algebra: the k smallest hashes of A ∪ B form the union
    sketch; the fraction of them present in both sides, scaled by the
    union estimate, estimates |A ∩ B| (Beyer et al., SIGMOD'07).

    This is the operation sketches exist for at 100 TB: the exact overlap
    needs a full shuffle of every (type, user) pair, while sketch
    intersection ships k=64 longs per side and composes (the per-type
    sketches would be precomputed once and reused across all pairs).
    Groups with < k union hashes fall back to exact (sketch is lossless
    there) — sf0.001 exercises that branch, sf0.01+ the estimate branch.
    The estimate expression is written with identical association in both
    engines, so the doubles are bit-equal without rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = spark.createDataFrame(EVENT_PAIRS, "t1 string, t2 string")
    s = ev.select(
        "event_type", md5_long(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    tagged = s.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("t1"))
        | (F.col("event_type") == F.col("t2")),
    )
    member = tagged.groupBy("t1", "t2", "h").agg(
        F.max((F.col("event_type") == F.col("t1")).cast("int")).alias("in_a"),
        F.max((F.col("event_type") == F.col("t2")).cast("int")).alias("in_b"),
    )
    w = Window.partitionBy("t1", "t2").orderBy("h")
    ranked = member.withColumn("rn", F.row_number().over(w))
    agg = (
        ranked.filter(F.col("rn") <= KMV_K)
        .groupBy("t1", "t2")
        .agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).alias("sk_size"),
            F.sum(
                (F.col("in_a") * F.col("in_b")).cast("long")
            ).alias("k_both"),
        )
    )
    exact = (
        member.groupBy("t1", "t2")
        .agg(
            F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias(
                "true_intersection"
            )
        )
    )
    est = F.when(
        F.col("sk_size") < KMV_K, F.col("k_both").cast("double")
    ).otherwise(
        F.col("k_both").cast("double")
        * F.lit(float(KMV_K - 1))
        * F.lit(TWO_60)
        / F.col("kth").cast("double")
        / F.lit(float(KMV_K))
    )
    return (
        agg.join(exact, ["t1", "t2"])
        .select("t1", "t2", "true_intersection", est.alias("est_intersection"))
        .orderBy("t1", "t2")
    )


_PAIRS_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in EVENT_PAIRS)

X_KMV_INTERSECT_SQL = f"""
WITH pairs(t1, t2) AS (VALUES {_PAIRS_VALUES}),
s AS (
  SELECT DISTINCT event_type,
         {sql_md5_long("CAST(user_id AS VARCHAR)")} AS h
  FROM events
), member AS (
  SELECT p.t1, p.t2, s.h,
         MAX(CASE WHEN s.event_type = p.t1 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.event_type = p.t2 THEN 1 ELSE 0 END) AS in_b
  FROM s JOIN pairs p ON s.event_type = p.t1 OR s.event_type = p.t2
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY t1, t2 ORDER BY h) AS rn
  FROM member
), a AS (
  SELECT t1, t2, MAX(h) AS kth, COUNT(*) AS sk_size,
         CAST(SUM(in_a * in_b) AS BIGINT) AS k_both
  FROM ranked WHERE rn <= {KMV_K}
  GROUP BY 1, 2
), exact AS (
  SELECT t1, t2, CAST(SUM(in_a * in_b) AS BIGINT) AS true_intersection
  FROM member GROUP BY 1, 2
)
SELECT a.t1, a.t2, exact.true_intersection,
       CASE WHEN a.sk_size < {KMV_K} THEN CAST(a.k_both AS DOUBLE)
            ELSE CAST(a.k_both AS DOUBLE)
                 * CAST('{KMV_K - 1}' AS DOUBLE)
                 * CAST('{1 << 60}' AS DOUBLE)
                 / CAST(a.kth AS DOUBLE)
                 / CAST('{KMV_K}' AS DOUBLE)
       END AS est_intersection
FROM a JOIN exact ON a.t1 = exact.t1 AND a.t2 = exact.t2
ORDER BY a.t1, a.t2
"""


# -- count-min sketch: heavy-hitter frequency estimation ----------------------

CM_DEPTH = 4
CM_WIDTH = 1024
CM_TOPN = 10


def x_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the 10 most active users,
    next to their exact event counts (Cormode-Muthukrishnan'05; reference
    has no aggregation surface, SURVEY.md §2.4).

    The sketch is a d x w counter matrix (d=4, w=1024): each event
    increments one counter per row at bucket md5(row:user) mod w; a
    user's estimate is the MIN of its d counters — always >= truth, over
    by at most ~2n/w with probability 1 - 2^-d. At 100 TB the matrix is
    4 KiB of state per partition, merged by addition (vs a full shuffle
    per exact count); here both the sketch fill (explode d rows ->
    groupBy (row, bucket), map-side partial) and the probe (broadcast of
    top-N x d cells) are DataFrame ops so the DuckDB oracle replays the
    exact same counters. Integer-only math — no float drift.
    """
    ev = load_table(spark, sf_dir, "events")
    rows = F.array(*[F.lit(j) for j in range(CM_DEPTH)])
    cell = ev.select(
        F.explode(rows).alias("j"), F.col("user_id")
    ).select(
        "j",
        (
            md5_long(
                F.concat(
                    F.col("j").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            )
            % CM_WIDTH
        ).alias("bucket"),
    )
    counters = cell.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    heavy = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_freq"))
        .orderBy(F.desc("true_freq"), "user_id")
        .limit(CM_TOPN)
    )
    probes = heavy.select(
        "user_id", "true_freq", F.explode(rows).alias("j")
    ).withColumn(
        "bucket",
        md5_long(
            F.concat(
                F.col("j").cast("string"),
                F.lit(":"),
                F.col("user_id").cast("string"),
            )
        )
        % CM_WIDTH,
    )
    return (
        F.broadcast(probes)
        .join(counters, ["j", "bucket"])
        .groupBy("user_id", "true_freq")
        .agg(F.min("cnt").alias("est_freq"))
        .orderBy("user_id")
    )


_CM_ROWS = ", ".join(f"({j})" for j in range(CM_DEPTH))

X_COUNTMIN_FREQ_SQL = f"""
WITH rows_(j) AS (VALUES {_CM_ROWS}),
cell AS (
  SELECT r.j,
         {sql_md5_long("CAST(r.j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")}
           % {CM_WIDTH} AS bucket
  FROM events e CROSS JOIN rows_ r
), counters AS (
  SELECT j, bucket, COUNT(*) AS cnt FROM cell GROUP BY 1, 2
), heavy AS (
  SELECT user_id, COUNT(*) AS true_freq
  FROM events GROUP BY 1
  ORDER BY true_freq DESC, user_id LIMIT {CM_TOPN}
), probes AS (
  SELECT h.user_id, h.true_freq, r.j,
         {sql_md5_long("CAST(r.j AS VARCHAR) || ':' || CAST(h.user_id AS VARCHAR)")}
           % {CM_WIDTH} AS bucket
  FROM heavy h CROSS JOIN rows_ r
)
SELECT p.user_id, p.true_freq, MIN(c.cnt) AS est_freq
FROM probes p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY 1, 2
ORDER BY p.user_id
"""


QUERIES = {
    "x_asof_join": x_asof_join,
    "x_range_join": x_range_join,
    "x_kmv_distinct": x_kmv_distinct,
    "x_hypertable_rollup": x_hypertable_rollup,
    "x_kmv_intersect": x_kmv_intersect,
    "x_countmin_freq": x_countmin_freq,
}

ORACLES = {
    "x_asof_join": X_ASOF_JOIN_SQL,
    "x_range_join": X_RANGE_JOIN_SQL,
    "x_kmv_distinct": X_KMV_DISTINCT_SQL,
    "x_hypertable_rollup": X_HYPERTABLE_ROLLUP_SQL,
    "x_kmv_intersect": X_KMV_INTERSECT_SQL,
    "x_countmin_freq": X_COUNTMIN_FREQ_SQL,
}
