"""Incremental connected components over a stream of edge batches.

The batch operator the reference cannot express at all: its graph is a
single-process mmap (kinbaku graph.py), so component maintenance means
re-walking the BSTs; here the labels are a parquet state table and every
micro-batch pays work proportional to the BATCH, not the graph.

Algorithm (textbook incremental CC by label contraction):

1. Load the label state (key → component label, a fixpoint: label = min
   key of the component) if it exists.
2. The batch's endpoints resolve their current labels; unseen endpoints
   label themselves.
3. Every batch edge becomes a CONTRACTION edge between two labels. The
   contraction graph is at most batch-sized — min-label propagation runs
   to fixpoint on it (operators/dedup.duplicate_clusters, the shared CC
   kernel), producing an (old_label → new_label) map.
4. The full label table remaps through that map with a broadcast join
   (map-side, no shuffle of the state table) and overwrites the state.

Invariant after every batch: labels equal the batch-mode
``Graph.connected_components`` of the union of all edges ingested so far —
locked by tests/test_streaming_cc.py across arbitrary batch splits.

Scale: step 3 is the whole trick — merges happen on the label-contraction
graph (≤ |batch| nodes), never on the accumulated graph. Step 4's remap is
the one full-state pass; at 100 TB the state is a Delta table and the
remap becomes MERGE INTO over only the changed labels (the map is tiny —
broadcast both ways). The parquet overwrite here is the single-file-system
stand-in, same as the MinHash band index (streaming/windows.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def _state_exists(labels_dir: str) -> bool:
    return os.path.isdir(labels_dir) and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(labels_dir)
        for f in files
    )


def cc_ingest_batch(batch_df: DataFrame, labels_dir: str) -> None:
    """One incremental-CC step: merge a batch of (src, dst) edges into the
    label state at ``labels_dir`` (parquet, schema ``key string, label
    string``). Isolated new nodes (self-loop-only or endpoint-only rows)
    still enter the state with their own key as label."""
    from kinbaku_spark.operators.dedup import duplicate_clusters

    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    edges = batch_df.select("src", "dst").localCheckpoint(eager=True)
    endpoints = (
        edges.select(F.col("src").alias("key"))
        .union(edges.select("dst"))
        .distinct()
    )
    if _state_exists(labels_dir):
        labels = spark.read.parquet(labels_dir)
    else:
        labels = spark.createDataFrame([], "key string, label string")
    # resolve batch endpoints to current labels; unseen endpoints start as
    # their own component (label = key, matching connected_components')
    resolved = endpoints.join(labels, "key", "left").select(
        "key", F.coalesce("label", F.col("key")).alias("label")
    ).localCheckpoint(eager=True)
    # contraction graph: one edge between the two endpoint LABELS
    lmap = F.broadcast(resolved.withColumnRenamed("key", "k"))
    contraction = (
        edges.join(lmap.select(F.col("k").alias("src"), F.col("label").alias("la")), "src")
        .join(lmap.select(F.col("k").alias("dst"), F.col("label").alias("lb")), "dst")
        .filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("lab_a"), F.col("lb").alias("lab_b"))
        .distinct()
    )
    cnodes = contraction.select(F.col("lab_a").alias("lab")).union(
        contraction.select("lab_b")
    ).distinct()
    # min-label fixpoint on the (batch-sized) contraction graph — the same
    # CC kernel the dedup family uses
    relabel = duplicate_clusters(cnodes, contraction, id_col="lab").select(
        F.col("lab").alias("old_label"), F.col("cluster_id").alias("new_label")
    )
    merged = (
        labels.unionByName(resolved.join(labels.select("key"), "key", "left_anti"))
        .join(F.broadcast(relabel), F.col("label") == F.col("old_label"), "left")
        .select("key", F.coalesce("new_label", "label").alias("label"))
    )
    # overwrite the state table: stage through a local checkpoint so the
    # write never reads the directory it is replacing
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(labels_dir)


def cc_ingest_to_parquet(
    edge_stream: DataFrame, labels_dir: str, checkpoint_dir: str | None = None
):
    """Streaming wrapper: foreachBatch over an edge stream, availableNow
    trigger (drain-then-stop, same cadence as heavy_hitters_to_parquet).
    Returns the StreamingQuery."""

    def step(bdf: DataFrame, _bid: int) -> None:
        cc_ingest_batch(bdf, labels_dir)

    writer = edge_stream.writeStream.foreachBatch(step).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
