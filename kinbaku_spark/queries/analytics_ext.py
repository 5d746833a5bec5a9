"""Warehouse/pipeline operators the reference lacks entirely (SURVEY.md
§2.4 — no time surface, no windows, no joins): cohort retention, moving
z-score anomaly flags, SCD type-2 history construction from an event log,
a data-quality audit, and overlapping document chunking (RAG prep).

Shuffle shapes (the 100 TB story):

- retention: the activity stream collapses to distinct (user, day) FIRST
  (map-side combine on the dominant key), then one groupBy user for the
  cohort date; the join back is user-dimension-sized and broadcast. The
  final (cohort, week) rollup is tiny. No self-join of raw events.
- anomaly: window runs over the already-reduced daily series (thousands
  of rows after one groupBy) — never over raw facts.
- scd2: one hash shuffle on the entity key; both window passes share the
  same partitioning and sort prefix, so Catalyst plans a single exchange
  + sort. At 100 TB this is the canonical "build dimension history from
  a change log" shape: shuffle once by key, window twice for free.
- dq audit: the three intra-table check groups fuse into one scan + one
  conditional aggregate per table (no per-check passes); referential
  checks are anti-joins that broadcast the PK side when small and
  shuffle-join otherwise. Output is a handful of rows.
- chunking: pure 1→N rowwise explode — no shuffle at all; chunk math is
  arithmetic on the existing length column, so the scan prunes to
  (doc_id, text). At 100 TB the operator is embarrassingly parallel and
  bounded by parquet read + write.

Determinism: integer day/week arithmetic, DECIMAL(18,6) sums cast to
double only at the end, identical double expression trees on both
engines, ties broken on unique keys (o_orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.operators.rank import running_max_exclusive, with_ntile
from kinbaku_spark.sources.tables import load_table

DEC = "decimal(18,6)"


# -- weekly cohort retention ---------------------------------------------------

def x_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity day
    (cohort), counted as retained in week N if active in [N*7, N*7+7)
    days after their cohort day.

    Raw events collapse to distinct (user_id, day) before any join —
    at 100 TB that distinct is the only big shuffle, keyed on the same
    (user, day) the downstream groupBy needs. The cohort map is
    |users|-sized and broadcast back.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(F.broadcast(cohorts), "user_id")
        .select(
            "cohort_day",
            F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("users"))
        .orderBy("cohort_day", "week_offset")
    )


X_RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(FLOOR(date_diff('day', c.cohort_day, d.day) / 7.0) AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT d.user_id) AS users
FROM days d JOIN cohorts c ON c.user_id = d.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- moving z-score anomaly flags over the daily revenue series ---------------

def x_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 28-day z-score anomaly flags on daily order revenue.
    The daily series is reduced to exact integer micro-units (BIGINT);
    the frame's power sums (sum, sum-of-daily-squares) stay exact
    integers (DECIMAL(38,0) on Spark, HUGEINT on DuckDB), converted to
    double only for the final mean/σ/z expressions — the identical
    expression tree then runs on both engines, so the doubles match
    bit-for-bit.

    The window sees the post-aggregation daily series, not raw orders.
    """
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast(DEC)
    daily = (
        orders.select(
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            p.alias("p"),
        )
        .groupBy("day")
        .agg((F.sum("p") * 1000000).cast("bigint").alias("rev_u"))
    )
    sq = F.col("rev_u").cast("decimal(38,0)") * F.col("rev_u").cast(
        "decimal(38,0)"
    )
    daily = daily.withColumn("sq_u", sq)
    w = Window.orderBy("day").rowsBetween(-27, Window.currentRow)
    s1 = F.sum("rev_u").over(w).cast("double") / 1000000.0
    s2 = F.sum("sq_u").over(w).cast("double") / 1000000000000.0
    n = F.count(F.lit(1)).over(w)
    stats = daily.select(
        "day",
        (F.col("rev_u").cast("double") / 1000000.0).alias("rev"),
        s1.alias("s1"),
        s2.alias("s2"),
        n.alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    out = stats.select(
        "day",
        "rev",
        mean.alias("mean28"),
        F.when((F.col("n") > 1) & (var > 0), F.sqrt(var)).alias("sd28"),
    )
    z = (F.col("rev") - F.col("mean28")) / F.col("sd28")
    return (
        out.select(
            "day",
            "rev",
            "mean28",
            "sd28",
            z.alias("z"),
            F.coalesce(F.abs(z) > 2.5, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("day")
    )


X_ANOMALY_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
           AS rev_u
  FROM orders GROUP BY 1
),
sq AS (
  SELECT day, rev_u,
         CAST(rev_u AS HUGEINT) * CAST(rev_u AS HUGEINT) AS sq_u
  FROM daily
),
stats AS (
  SELECT day, CAST(rev_u AS DOUBLE) / 1000000.0 AS rev,
         CAST(SUM(rev_u) OVER w AS DOUBLE) / 1000000.0 AS s1,
         CAST(SUM(sq_u) OVER w AS DOUBLE) / 1000000000000.0 AS s2,
         COUNT(*) OVER w AS n
  FROM sq
  WINDOW w AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
),
scored AS (
  SELECT day, rev, s1 / n AS mean28,
         CASE WHEN n > 1 AND (s2 - s1 * s1 / n) / (n - 1) > 0
              THEN SQRT((s2 - s1 * s1 / n) / (n - 1)) END AS sd28
  FROM stats
)
SELECT day, rev, mean28, sd28,
       (rev - mean28) / sd28 AS z,
       COALESCE(ABS((rev - mean28) / sd28) > 2.5, FALSE) AS is_anomaly
FROM scored ORDER BY day
"""


# -- SCD type-2 history from a change log -------------------------------------

def x_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a slowly-changing-dimension (type 2) history of each
    customer's order priority from the orders log: consecutive equal
    values collapse, each change opens a [valid_from, valid_to) interval,
    the live row has valid_to NULL. The standard "dimension history from
    CDC/event log" construction.

    One shuffle on o_custkey; the change-point filter and the interval
    close (lead) share that partitioning and sort order.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .withColumn("prev", F.lag("o_orderpriority").over(w))
        .filter(
            F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority"))
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        changes.select(
            "o_custkey",
            F.row_number().over(w2).alias("version"),
            "o_orderpriority",
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w2).alias("valid_to"),
        )
        .orderBy("o_custkey", "version")
    )


X_SCD2_SQL = """
WITH marked AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         LAG(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev
  FROM orders
),
changes AS (
  SELECT * FROM marked
  WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey,
       ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS version,
       o_orderpriority,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to
FROM changes ORDER BY o_custkey, version
"""


# -- data-quality audit (Deequ-style constraint suite) ------------------------

def x_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over the warehouse in a handful of fused scans:
    completeness (nulls), uniqueness (PK duplicates), referential
    integrity (orphan FKs via anti-join), and a domain rule — each check
    one row (check, violations).

    Intra-table checks fuse into ONE conditional aggregate per table;
    the two referential checks are anti-joins (broadcast the PK side
    when it fits, shuffle otherwise — Catalyst decides).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    cnt = F.count(F.lit(1))
    li_checks = li.agg(
        F.sum(F.col("l_orderkey").isNull().cast("bigint")).alias(
            "lineitem_null_orderkey"
        ),
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias(
            "lineitem_nonpositive_qty"
        ),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("bigint")
        ).alias("lineitem_discount_range"),
    )
    o_checks = orders.agg(
        (cnt - F.count_distinct("o_orderkey")).alias("orders_dup_pk"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias(
            "orders_nonpositive_total"
        ),
    )
    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(cnt.alias("v"))
        .select(F.lit("lineitem_orphan_orderkey").alias("dq_check"), F.col("v"))
    )
    orphan_o = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(cnt.alias("v"))
        .select(F.lit("orders_orphan_custkey").alias("dq_check"), F.col("v"))
    )

    def melt(df: DataFrame) -> DataFrame:
        cols = df.columns
        pairs = []
        for c in cols:
            pairs += [F.lit(c), F.col(c).cast("bigint")]
        return df.select(
            F.explode(F.create_map(*pairs)).alias("dq_check", "v")
        )

    return (
        melt(li_checks)
        .unionByName(melt(o_checks))
        .unionByName(orphan_li)
        .unionByName(orphan_o)
        .select("dq_check", F.col("v").alias("violations"))
        .orderBy("dq_check")
    )


X_DQ_SQL = """
SELECT 'lineitem_null_orderkey' AS dq_check,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS violations
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_qty',
       CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_dup_pk',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_nonpositive_total',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_orphan_orderkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'orders_orphan_custkey', CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
ORDER BY dq_check
"""


# -- overlapping document chunking (RAG / context-window prep) ----------------

def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into 40-char chunks with 10-char overlap
    (stride 30) — the standard RAG / context-window prep. Chunk starts
    are generated per row with sequence()/explode (1→N, no shuffle);
    substring math runs on the pruned (doc_id, text) projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text"), F.lit(30))
            ).alias("start"),
            "text",
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / 30).cast("bigint").alias("chunk_id"),
            F.substring(F.col("text"), F.col("start"), F.lit(40)).alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    )


X_CHUNK_SQL = """
SELECT doc_id,
       CAST((s.start - 1) / 30 AS BIGINT) AS chunk_id,
       substr(text, s.start, 40) AS chunk_text,
       length(substr(text, s.start, 40)) AS chunk_len
FROM documents,
     LATERAL (
       SELECT unnest(generate_series(1, length(text), 30)) AS start
     ) s
WHERE length(text) > 0
ORDER BY doc_id, chunk_id
"""


QUERIES = {
    "x_retention_cohorts": x_retention_cohorts,
    "x_anomaly_zscore": x_anomaly_zscore,
    "x_scd2_history": x_scd2_history,
    "x_dq_audit": x_dq_audit,
    "x_chunk_documents": x_chunk_documents,
}
ORACLES = {
    "x_retention_cohorts": X_RETENTION_SQL,
    "x_anomaly_zscore": X_ANOMALY_SQL,
    "x_scd2_history": X_SCD2_SQL,
    "x_dq_audit": X_DQ_SQL,
    "x_chunk_documents": X_CHUNK_SQL,
}


# -- last-touch attribution ---------------------------------------------------

def x_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, credit the user's most
    recent PRIOR non-purchase event (the touchpoint); report credited
    conversions and revenue per touchpoint type. The canonical marketing
    attribution query.

    One shuffle on user_id; the purchase/touch interleave is a single
    window pass (last_value over the preceding frame), never a self-join
    of the event stream — at 100 TB the stream is touched once.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter((F.col("event_type") == "purchase") & F.col("touch").isNotNull())
        .groupBy("touch")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("revenue"),
        )
        .orderBy("touch")
    )


X_ATTRIBUTION_SQL = """
WITH marked AS (
  SELECT event_type, value,
         LAST_VALUE(
           CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS
         ) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS touch
  FROM events
)
SELECT touch, COUNT(*) AS conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM marked
WHERE event_type = 'purchase' AND touch IS NOT NULL
GROUP BY touch ORDER BY touch
"""


# -- bigram language-model statistics -----------------------------------------

BIGRAM_MIN_COUNT = 10


def x_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram statistics over the document corpus: count and conditional
    probability P(w2 | w1) = c(w1,w2)/c(w1·) for bigrams seen >=
    BIGRAM_MIN_COUNT times — the n-gram counting pass under classical LM
    training and data-quality heuristics (repetition detection).

    Bigrams come from one window (lead over doc-local token positions) —
    tokenize once, shuffle once on doc to order tokens, then one count
    shuffle; probabilities are integer-count ratios (exact replay).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
            "pos", "tok"
        ),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        bi.filter(F.col("c12") >= BIGRAM_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .select(
            "w1",
            "w2",
            "c12",
            (F.col("c12") / F.col("c1")).alias("p_cond"),
        )
        .orderBy("w1", "w2")
    )


X_BIGRAM_SQL = f"""
WITH lists AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
  FROM lists
),
toks_clean AS (SELECT * FROM toks WHERE tok <> ''),
seq AS (
  SELECT doc_id, tok,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM toks_clean
),
bi AS (
  SELECT tok AS w1, nxt AS w2, COUNT(*) AS c12
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM bi GROUP BY w1)
SELECT bi.w1, bi.w2, bi.c12, bi.c12 / c1.c1 AS p_cond
FROM bi JOIN c1 ON c1.w1 = bi.w1
WHERE bi.c12 >= {BIGRAM_MIN_COUNT}
ORDER BY bi.w1, bi.w2
"""


QUERIES.update(
    {
        "x_attribution_last_touch": x_attribution_last_touch,
        "x_bigram_stats": x_bigram_stats,
    }
)
ORACLES.update(
    {
        "x_attribution_last_touch": X_ATTRIBUTION_SQL,
        "x_bigram_stats": X_BIGRAM_SQL,
    }
)


# -- RFM customer segmentation ------------------------------------------------

def x_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (exact-decimal total spend); each dimension scored into quartiles
    (ntile with unique-key tiebreak), combined into the classic
    'RFM' cell label. Returns the per-cell census.

    One shuffle on custkey for the per-customer rollup; the three exact
    ntile passes run over the customer-dimension aggregate (never raw
    orders) as distributed range-parallel ranks, then one tiny groupBy
    cells.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("day", F.max("o_orderdate")).alias("maxd")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.date_trunc("day", F.max("o_orderdate")).alias("lastd"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("money_dec"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            F.datediff(F.col("maxd"), F.col("lastd")).alias("recency_days"),
            "freq",
            F.col("money_dec").cast("double").alias("monetary"),
        )
    )
    # quartile scores: recency ascending (1 = most recent), freq/monetary
    # descending (1 = best); o_custkey breaks every tie deterministically.
    # Each dimension is one exact distributed-ntile pass (operators/
    # rank.py) — three range-parallel rank passes over the customer
    # aggregate, zero single-partition windows.
    scored = with_ntile(
        per_cust, 4, [F.col("recency_days"), F.col("o_custkey")], "r"
    )
    scored = with_ntile(scored, 4, [F.desc("freq"), F.col("o_custkey")], "f")
    scored = with_ntile(
        scored, 4, [F.desc("monetary"), F.col("o_custkey")], "m"
    )
    scored = scored.select("r", "f", "m")
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count(F.lit(1)).alias("customers"))
        .select(
            F.concat_ws("-", "r", "f", "m").alias("cell"),
            "r",
            "f",
            "m",
            "customers",
        )
        .orderBy("r", "f", "m")
    )


X_RFM_SQL = """
WITH bounds AS (
  SELECT date_trunc('day', MAX(o_orderdate)) AS maxd FROM orders
),
per_cust AS (
  SELECT o_custkey,
         date_diff('day', date_trunc('day', MAX(o_orderdate)),
                   (SELECT maxd FROM bounds)) AS recency_days,
         COUNT(*) AS freq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r,
         NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
  FROM per_cust
)
SELECT CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR) || '-'
         || CAST(m AS VARCHAR) AS cell,
       r, f, m, COUNT(*) AS customers
FROM scored GROUP BY r, f, m ORDER BY r, f, m
"""


# -- fulfillment lag distribution ---------------------------------------------

def x_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag distribution per order priority: exact quantiles of
    datediff(l_shipdate, o_orderdate) across each priority's line items,
    plus mean lag from exact integer sums. The fact join shuffles on
    orderkey (orders broadcasts at every SF below ~1B orders); the
    quantile aggregation is one pass over integer lags.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    joined = li.join(
        F.broadcast(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("o_orderpriority", lag.alias("lag_days"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.percentile("lag_days", 0.5).alias("p50"),
            F.percentile("lag_days", 0.9).alias("p90"),
            F.round(
                F.sum("lag_days") / F.count(F.lit(1)), 6
            ).alias("avg_lag"),
            F.max("lag_days").alias("max_lag"),
        )
        .orderBy("o_orderpriority")
    )


X_FULFILLMENT_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.5) AS p50,
       quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.9) AS p90,
       ROUND(SUM(date_diff('day', o_orderdate, l_shipdate)) * 1.0
             / COUNT(*), 6) AS avg_lag,
       MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_lag
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES.update(
    {
        "x_rfm_segmentation": x_rfm_segmentation,
        "x_fulfillment_lag": x_fulfillment_lag,
    }
)
ORACLES.update(
    {
        "x_rfm_segmentation": X_RFM_SQL,
        "x_fulfillment_lag": X_FULFILLMENT_SQL,
    }
)


# -- 2D skyline (Pareto frontier) ---------------------------------------------

def x_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of orders on (cheaper, more recent): an order is on
    the skyline iff no other order is both cheaper-or-equal and
    more-recent-or-equal (with one strict). Computed with the sort-scan
    trick, not the naive O(n²) dominance self-join: sort by price (ties:
    date desc), keep rows whose date strictly exceeds the running max
    date seen so far — one range-partitioned sort + parallel prefix max.

    The running max is operators/rank.py running_max_exclusive: a
    range-partitioned exchange, per-partition exclusive prefix max, and
    a P-row boundary merge — genuinely parallel, never a single-partition
    window. The naive formulation (the SQL oracle deliberately uses it —
    NOT EXISTS dominance — as algorithm-independent evidence) is a
    quadratic inequality join: ~15 s at the sf0.01 gate, minutes at
    sf0.1. The gap IS the point: same semantics, linearithmic vs
    quadratic plan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        running_max_exclusive(
            orders.select("o_orderkey", "o_totalprice", "o_orderdate"),
            [
                F.col("o_totalprice"),
                F.desc("o_orderdate"),
                F.col("o_orderkey"),
            ],
            "o_orderdate",
            "prev_max",
        )
        .filter(
            F.col("prev_max").isNull()
            | (F.col("o_orderdate") > F.col("prev_max"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy("o_totalprice", "o_orderkey")
    )


X_SKYLINE_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders d
  WHERE d.o_totalprice <= o.o_totalprice
    AND d.o_orderdate >= o.o_orderdate
    AND (d.o_totalprice < o.o_totalprice OR d.o_orderdate > o.o_orderdate
         OR (d.o_totalprice = o.o_totalprice AND d.o_orderdate = o.o_orderdate
             AND d.o_orderkey < o.o_orderkey))
)
ORDER BY o_totalprice, o_orderkey
"""


QUERIES["x_skyline_orders"] = x_skyline_orders
ORACLES["x_skyline_orders"] = X_SKYLINE_SQL


# -- full-outer reconciliation: purchases vs signups per user-day -------------

def x_reconcile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independently aggregated daily series — purchase revenue and
    signup counts per (user, day) — reconciled with a FULL OUTER join, the
    standard two-ledger comparison shape (billing vs usage, shipped vs
    invoiced). Each side collapses to per-user-day aggregates BEFORE the
    join, so the outer join runs on dimension-sized inputs; at 100 TB both
    sides shuffle once on the same (user_id, day) key and co-partition.

    The reference has no join surface at all (SURVEY.md §2.4); this covers
    the one join type (FullOuter) the rest of the suite doesn't.
    """
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(F.col("value").cast(DEC)).alias("rev_dec"),
        )
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("signups"))
    )
    return (
        p.join(s, ["user_id", "day"], "full_outer")
        .select(
            "user_id",
            "day",
            F.coalesce("purchases", F.lit(0)).alias("purchases"),
            F.coalesce(F.col("rev_dec").cast("double"), F.lit(0.0)).alias("purchase_rev"),
            F.coalesce("signups", F.lit(0)).alias("signups"),
        )
        .orderBy("user_id", "day")
    )


X_RECONCILE_SQL = """
WITH p AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS purchases,
         SUM(CAST(value AS DECIMAL(18,6))) AS rev_dec
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
s AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS signups
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
)
SELECT COALESCE(p.user_id, s.user_id) AS user_id,
       COALESCE(p.day, s.day) AS day,
       CAST(COALESCE(p.purchases, 0) AS BIGINT) AS purchases,
       COALESCE(CAST(p.rev_dec AS DOUBLE), 0.0) AS purchase_rev,
       CAST(COALESCE(s.signups, 0) AS BIGINT) AS signups
FROM p FULL OUTER JOIN s ON p.user_id = s.user_id AND p.day = s.day
ORDER BY 1, 2
"""


QUERIES["x_reconcile_daily"] = x_reconcile_daily
ORACLES["x_reconcile_daily"] = X_RECONCILE_SQL


# -- n-gram LM fluency score per document -------------------------------------

def x_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency under the corpus bigram model — the classical
    LM-based quality filter (KenM-style perplexity ranking, linearized):
    each document's bigrams are scored with the corpus-wide conditional
    probability P(w2|w1), and the document gets the mean. Log-probabilities
    are deliberately avoided (ln differs between JVM and libm in the last
    ulp); probabilities are integer ppm via floor(c12*1e6 / c1), so every
    value replays exactly in any engine.

    Shuffle story: tokenize once; ONE shuffle on doc_id orders tokens for
    the bigram window; the bigram-count aggregation feeds a model that
    BROADCASTS back onto the already-doc_id-partitioned bigram stream, and
    the final per-doc aggregation reuses that partitioning — the fact
    stream shuffles exactly once. At 100 TB the model gets a min-count
    prune before broadcast (here the corpus vocabulary is small).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
        # two consumers (model build + scoring): materialize the tokenized
        # bigram stream once instead of re-tokenizing the corpus
        .localCheckpoint(eager=False)
    )
    bi = seq.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = bi.join(F.broadcast(c1), "w1").select(
        "w1", "w2", F.expr("(c12 * 1000000) div c1").alias("p_ppm")
    )
    per_doc = (
        seq.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_ppm").alias("total_ppm"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("total_ppm", F.lit(0)).alias("total_ppm"),
            F.coalesce(
                F.expr("total_ppm div n_bigrams"), F.lit(0)
            ).alias("mean_ppm"),
        )
        .orderBy("doc_id")
    )


X_DOC_LM_SQL = """
WITH lists AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
  FROM lists
),
toks_clean AS (SELECT * FROM toks WHERE tok <> ''),
seq AS (
  SELECT doc_id, tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks_clean
),
seq_clean AS (SELECT * FROM seq WHERE w2 IS NOT NULL),
bi AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM seq_clean GROUP BY 1, 2
),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM bi GROUP BY w1),
model AS (
  SELECT bi.w1, bi.w2, (bi.c12 * 1000000) // c1.c1 AS p_ppm
  FROM bi JOIN c1 ON c1.w1 = bi.w1
),
per_doc AS (
  SELECT s.doc_id, COUNT(*) AS n_bigrams, SUM(m.p_ppm) AS total_ppm
  FROM seq_clean s JOIN model m ON m.w1 = s.w1 AND m.w2 = s.w2
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(p.total_ppm, 0) AS BIGINT) AS total_ppm,
       CAST(COALESCE(p.total_ppm // p.n_bigrams, 0) AS BIGINT) AS mean_ppm
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


QUERIES["x_doc_lm_score"] = x_doc_lm_score
ORACLES["x_doc_lm_score"] = X_DOC_LM_SQL
