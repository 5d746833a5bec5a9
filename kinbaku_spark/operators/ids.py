"""Deterministic dense id assignment without a global single-task sort.

The naive `row_number() OVER (ORDER BY key)` plans a single-partition
Window — one task sorting every key, the classic 10^9-node scale cliff
(VERDICT r01 #5). Two-phase range ids produce the IDENTICAL mapping
(0-based dense ids in ascending key order):

1. range-partition the keys (repartitionByRange) so partition p holds a
   contiguous key range, every range ordered before partition p+1's;
2. rank within each partition in parallel (window PARTITIONED by the
   range partition id);
3. offset each partition's local ranks by the cumulative count of all
   earlier partitions — a P-row prefix sum (P = number of partitions),
   sorted on the driver-side-sized counts table, never on the data.

Ids depend only on the global key order, so the (sampled, possibly
input-order-sensitive) placement of range boundaries never changes the
result — only which task computes which slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ordered_zero_ids(
    keys_df: DataFrame,
    key_col: str = "key",
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(key, id): dense 0-based ids by ascending key, assigned with
    range-parallel sorts + a P-row offset join instead of one global
    single-task window sort. Keys must be distinct."""
    spark = keys_df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # PIN the range partitioning before fanning out: both the local-rank
    # branch and the counts branch read `parts`, and range boundaries
    # come from sampling — two independently planned exchanges can place
    # boundaries differently, pairing one partitioning's offsets with the
    # other's ranks (observed at sf0.1: ids off by a few slots). A lazy
    # persist pins a single partitioning for both consumers — they scan
    # ONE InMemoryRelation over one exchange, and cache-miss recompute
    # re-reads the written shuffle files rather than re-sampling — at the
    # cost of cache residency, not the eager checkpoint's extra job
    # (operators/rank.py module docstring has the full argument).
    parts = (
        keys_df.repartitionByRange(p, F.col(key_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    local = parts.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__pid").orderBy(key_col)) - 1,
    )
    counts = parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    # P-row triangular self-join: offset of partition p = counts of all
    # earlier partitions. Window-free by design, so Spark's
    # unpartitioned-window warning stays a true-positive signal
    # (operators/rank.py module docstring).
    earlier = counts.select(
        F.col("__pid").alias("__qid"), F.col("__c").alias("__e")
    )
    offsets = (
        counts.join(
            F.broadcast(earlier), F.col("__qid") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__e"), F.lit(0)).alias("__off"))
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        key_col, (F.col("__rn") + F.col("__off")).cast("long").alias(id_col)
    )
