"""Behavioral-analytics and pipeline-governance operators: event-type
Markov transitions, session path mining, leakage-audited temporal splits,
inverse-frequency class weights, and blocklist safety filtering.

The reference (kerighan/kinbaku) has no event/sequence surface at all
(SURVEY.md §2.4 — no window functions, no aggregation framework); these
extend the behavioral/curation surface on the driver's `events` /
`documents` / `embeddings` tables.

Shuffle shapes (the 100 TB story):

- transitions: ONE window shuffle partitioned by user_id (users are the
  natural partition key; no global sort), then a groupBy over
  (cur, next) whose output is O(|event_types|^2) — tiny regardless of
  corpus size, with map-side partial aggregation.
- session paths: reuses the same user_id partitioning for gap
  sessionization AND the per-session rank — one shuffle serves both
  windows; the path groupBy keys on (user_id, session_id) so it stays in
  the same hash space; the final top-k is a TakeOrderedAndProject over
  the O(paths) aggregate, never a global sort of events.
- temporal split: two-level aggregate — (event_type, user_id) partials
  first (map-side combine collapses each user's events), then the tiny
  per-type rollup; no distinct-shuffle over raw events.
- class weights: one groupBy(label) — output is O(labels).
- blocklist: shuffle-free projection + one groupBy(source); the
  blocklist itself is a literal expression (at 100 TB with a large
  lexicon, swap for a broadcast join against a terms table — same plan
  shape, still no fact-side shuffle).

Determinism: probabilities/ratios are exact BIGINT ppm (integer div —
no double-summation order hazards); path strings are built from
explicitly rank-ordered arrays, never engine collection order; blocklist
matching uses substring containment on space-padded lowercase text, not
regex (dialect-proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kinbaku_spark.queries.relational import SESSION_GAP_US
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_event_transitions: first-order Markov chain over event types ----------

def x_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type pairs -> transition counts and
    conditional P(next | cur) in exact integer ppm.

    The user-journey Markov model (next-action prediction, funnel
    drop-off). One window shuffle on user_id; the (cur,next) aggregate is
    bounded by the event-type vocabulary, not the event count.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("next"),
        )
        .where(F.col("next").isNotNull())
        .groupBy("cur", "next")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wtot = Window.partitionBy("cur")
    return (
        pairs.withColumn("n_from_cur", F.sum("n_transitions").over(wtot))
        .select(
            "cur",
            "next",
            "n_transitions",
            F.expr("n_transitions * 1000000 div n_from_cur").alias("prob_ppm"),
        )
        .orderBy("cur", "next")
    )


X_EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next
  FROM events
),
agg AS (
  SELECT cur, next, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE next IS NOT NULL GROUP BY cur, next
)
SELECT cur, next, n_transitions,
       CAST((n_transitions * 1000000)
            // SUM(n_transitions) OVER (PARTITION BY cur) AS BIGINT) AS prob_ppm
FROM agg
ORDER BY cur, next
"""


# -- x_session_paths: most common session-opening paths ----------------------

PATH_PREFIX_LEN = 5  # events per session kept in the path signature
TOP_PATHS = 20


def x_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: the first 5 event types of every session
    (30-min gap rule shared with q_events_sessions), concatenated in
    order, ranked by frequency.

    The journey-mining complement of the transition matrix: full ordered
    prefixes, not first-order hops. The path string is built from an
    explicitly rank-sorted array (array_sort over (rank, type) structs) —
    never collect_list's arrival order.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    sess = ev.withColumn(
        "new_session",
        F.when(gap <= SESSION_GAP_US, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn("session_id", F.sum("new_session").over(wsum))
    wrank = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    paths = (
        sess.withColumn("rn", F.row_number().over(wrank))
        .where(F.col("rn") <= PATH_PREFIX_LEN)
        .groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
    )
    return (
        paths.groupBy("path", "path_len")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(TOP_PATHS)
    )


X_SESSION_PATHS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) <= {SESSION_GAP_US}
         THEN 0 ELSE 1 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
), ranked AS (
  SELECT user_id, session_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                       ORDER BY ts, event_id) AS rn
  FROM numbered
), per_session AS (
  SELECT user_id, session_id,
         STRING_AGG(event_type, '>' ORDER BY rn) AS path,
         CAST(COUNT(*) AS BIGINT) AS path_len
  FROM ranked WHERE rn <= {PATH_PREFIX_LEN}
  GROUP BY user_id, session_id
)
SELECT path, path_len, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM per_session
GROUP BY path, path_len
ORDER BY n_sessions DESC, path
LIMIT {TOP_PATHS}
"""


# -- x_temporal_split: time-cutoff train/test split with leakage audit -------

SPLIT_CUTOFF = "2024-01-22"  # ~70/30 over the driver's Jan-2024 event span


def x_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split at a fixed cutoff with a per-type
    leakage audit: how many users appear on BOTH sides (entity leakage —
    the failure mode a random split hides and a temporal split must
    report).

    Two-level aggregate: (event_type, user_id) partials collapse each
    user's events map-side; the rollup to per-type counts touches
    O(types x users) rows, never the raw events twice.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(SPLIT_CUTOFF).cast("timestamp")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("n_tr"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("n_te"),
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum("n_tr").cast("long").alias("n_train"),
            F.sum("n_te").cast("long").alias("n_test"),
            F.sum(F.when(F.col("n_tr") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_users_train"),
            F.sum(F.when(F.col("n_te") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_users_test"),
            F.sum(F.when((F.col("n_tr") > 0) & (F.col("n_te") > 0), 1).otherwise(0))
            .cast("long")
            .alias("n_users_leaked"),
        )
        .orderBy("event_type")
    )


X_TEMPORAL_SPLIT_SQL = f"""
WITH per_user AS (
  SELECT event_type, user_id,
         SUM(CASE WHEN ts < TIMESTAMP '{SPLIT_CUTOFF}' THEN 1 ELSE 0 END) AS n_tr,
         SUM(CASE WHEN ts >= TIMESTAMP '{SPLIT_CUTOFF}' THEN 1 ELSE 0 END) AS n_te
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(SUM(n_tr) AS BIGINT) AS n_train,
       CAST(SUM(n_te) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_train,
       CAST(SUM(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_test,
       CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_leaked
FROM per_user
GROUP BY event_type
ORDER BY event_type
"""


# -- x_class_weights: inverse-frequency loss weights -------------------------

def x_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label inverse-frequency weights over the embedding corpus
    (sklearn's `class_weight='balanced'`: total / (n_classes * n_label)),
    in exact integer ppm.

    One groupBy(label); the normalizing totals run on the O(labels)
    aggregate via a single-partition window — labels are O(100) even at
    100 TB.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    per = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_samples"))
    w = Window.partitionBy()
    return (
        per.withColumn("total", F.sum("n_samples").over(w))
        .withColumn("k", F.count(F.lit(1)).over(w))
        .select(
            "label",
            "n_samples",
            F.expr("n_samples * 1000000 div total").alias("share_ppm"),
            F.expr("total * 1000000 div (k * n_samples)").alias("weight_ppm"),
        )
        .orderBy("label")
    )


X_CLASS_WEIGHTS_SQL = """
WITH per AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_samples
  FROM embeddings GROUP BY label
)
SELECT label, n_samples,
       CAST((n_samples * 1000000) // (SELECT SUM(n_samples) FROM per) AS BIGINT)
         AS share_ppm,
       CAST(((SELECT SUM(n_samples) FROM per) * 1000000)
            // ((SELECT COUNT(*) FROM per) * n_samples) AS BIGINT) AS weight_ppm
FROM per
ORDER BY label
"""


# -- x_safety_blocklist: lexicon-based content filter ------------------------

# Stand-in lexicon (real deployments broadcast-join a curated terms table;
# the plan shape is identical). Lowercase, no punctuation.
BLOCKLIST = ("attack", "exploit", "weapon", "malware")


def x_safety_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source safety-filter report: docs flagged by a word-boundary
    blocklist match, with the flag rate in ppm — the lexicon gate every
    pretraining pipeline runs before model-based toxicity scoring.

    Matching is substring containment on space-padded lowercase text
    (' ' || lower(text) || ' ' CONTAINS ' term '): word-boundary-safe
    without regex, so both engines agree by construction. Shuffle-free
    projection + one groupBy(source).
    """
    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    flagged = None
    for term in BLOCKLIST:
        hit = F.contains(padded, F.lit(f" {term} "))
        flagged = hit if flagged is None else (flagged | hit)
    return (
        docs.withColumn("flagged", flagged)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("flagged"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        .withColumn("flag_ppm", F.expr("n_flagged * 1000000 div n_docs"))
        .orderBy("source")
    )


def _blocklist_sql() -> str:
    clauses = " OR ".join(
        f"contains(' ' || lower(text) || ' ', ' {t} ')" for t in BLOCKLIST
    )
    return f"""
WITH scored AS (
  SELECT source, ({clauses}) AS flagged FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST((SUM(CASE WHEN flagged THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
            AS BIGINT) AS flag_ppm
FROM scored
GROUP BY source
ORDER BY source
"""


QUERIES["x_event_transitions"] = x_event_transitions
ORACLES["x_event_transitions"] = X_EVENT_TRANSITIONS_SQL
QUERIES["x_session_paths"] = x_session_paths
ORACLES["x_session_paths"] = X_SESSION_PATHS_SQL
QUERIES["x_temporal_split"] = x_temporal_split
ORACLES["x_temporal_split"] = X_TEMPORAL_SPLIT_SQL
QUERIES["x_class_weights"] = x_class_weights
ORACLES["x_class_weights"] = X_CLASS_WEIGHTS_SQL
QUERIES["x_safety_blocklist"] = x_safety_blocklist
ORACLES["x_safety_blocklist"] = _blocklist_sql()
