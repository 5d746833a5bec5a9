"""Multiset set-operations and duplicate-group survivorship.

The reference implements set intersection/difference only on neighbor
SETS (SURVEY.md §2.1 R9/R10, M5/M6); these extend the set-operation
family with the MULTISET forms (EXCEPT ALL / INTERSECT ALL — duplicate
counts matter) and the dedup family with the survivorship step (pick the
canonical record per duplicate group, drop the rest).

Shuffle shapes (the 100 TB story):

- multiset ops: Spark's exceptAll/intersectAll compile to the same
  count-tagged aggregation a hand-rolled version would use — ONE shuffle
  per side on the value key; the demo keys are single columns so
  map-side partials collapse the fact tables first.
- survivorship: duplicate groups come from the exact-dedup 128-bit text
  hash (one groupBy); the canonical pick is an in-group max over
  (n_chars, -doc_id) structs — no window needed, one aggregation.

Determinism: multiset results are exact integer multiplicities;
survivor choice is a total order (longest text, then lowest doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# -- x_multiset_ops: EXCEPT ALL / INTERSECT ALL with duplicate counts --------

def x_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset algebra over order-part incidence: part keys on urgent
    orders EXCEPT ALL part keys on low-priority orders (per-occurrence,
    not per-distinct-value), summarized as per-part surviving
    multiplicity — the bag semantics `except`/`intersect` silently
    discard.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    keyed = li.join(
        F.broadcast(o.select("o_orderkey", "o_orderpriority")),
        li.l_orderkey == F.col("o_orderkey"),
    )
    urgent = keyed.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("l_partkey").alias("part")
    )
    low = keyed.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("l_partkey").alias("part")
    )
    return (
        urgent.exceptAll(low)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("surviving_multiplicity"))
        .orderBy(F.desc("surviving_multiplicity"), "part")
        .limit(25)
    )


X_MULTISET_SQL = """
WITH keyed AS (
  SELECT l.l_partkey AS part, o.o_orderpriority
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
survived AS (
  SELECT part FROM keyed WHERE o_orderpriority = '1-URGENT'
  EXCEPT ALL
  SELECT part FROM keyed WHERE o_orderpriority = '5-LOW'
)
SELECT part, CAST(COUNT(*) AS BIGINT) AS surviving_multiplicity
FROM survived
GROUP BY part
ORDER BY surviving_multiplicity DESC, part
LIMIT 25
"""


# -- x_dedup_survivorship: canonical record per duplicate group --------------

def x_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship over exact-duplicate text groups: one canonical
    document per group (longest text, ties to the lowest doc id — a
    total order), with the group size and number dropped — the merge
    step that turns dedup PAIRS into a deduplicated corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        F.md5(F.col("text")).alias("grp"), "doc_id", "n_chars"
    )
    groups = (
        keyed.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))
            ).alias("best"),
        )
        .where(F.col("group_size") > 1)
    )
    return (
        groups.select(
            (-F.col("best.nid")).cast("long").alias("survivor_doc_id"),
            F.col("best.n_chars").cast("long").alias("survivor_n_chars"),
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("group_size") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("survivor_doc_id")
    )


X_SURVIVORSHIP_SQL = """
WITH keyed AS (
  SELECT md5(text) AS grp, doc_id, n_chars FROM documents
),
groups AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS group_size,
         MAX(struct_pack(nc := n_chars, nid := -doc_id)) AS best
  FROM keyed GROUP BY grp
  HAVING COUNT(*) > 1
)
SELECT CAST(-best.nid AS BIGINT) AS survivor_doc_id,
       CAST(best.nc AS BIGINT) AS survivor_n_chars,
       group_size,
       CAST(group_size - 1 AS BIGINT) AS n_dropped
FROM groups
ORDER BY survivor_doc_id
"""


QUERIES["x_multiset_ops"] = x_multiset_ops
ORACLES["x_multiset_ops"] = X_MULTISET_SQL
QUERIES["x_dedup_survivorship"] = x_dedup_survivorship
ORACLES["x_dedup_survivorship"] = X_SURVIVORSHIP_SQL
