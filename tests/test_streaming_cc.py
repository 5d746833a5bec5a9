"""Incremental connected components (streaming/graph_cc.py): the label
state after any sequence of edge batches must equal the batch-mode
Graph.connected_components of the union — across arbitrary batch splits,
through the streaming wrapper, and under merges that join previously
separate components."""

from __future__ import annotations

import glob
import os
import random
import shutil
import tempfile

import networkx as nx
from pyspark.sql import functions as F

from kinbaku_spark.graph import Graph
from kinbaku_spark.streaming.graph_cc import cc_ingest_batch, cc_ingest_to_parquet


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    es = {
        (f"n{rng.randrange(n_nodes):02d}", f"n{rng.randrange(n_nodes):02d}")
        for _ in range(n_edges)
    }
    return sorted((u, v) for u, v in es if u != v)


def _batch_state(spark, labels_dir):
    return sorted(
        (r.key, r.label) for r in spark.read.parquet(labels_dir).collect()
    )


def _expected(spark, edges):
    g = Graph.from_edges(
        spark.createDataFrame(edges, "src string, dst string").withColumn(
            "type", F.lit(0)
        )
    )
    return sorted(
        (r.key, r.component) for r in g.connected_components().collect()
    )


def test_incremental_cc_equals_batch_cc_across_splits(spark):
    edges = _random_edges(31, 40, 70)
    for n_batches in (1, 3, 7):
        d = tempfile.mkdtemp(prefix="kb_cc_")
        try:
            for i in range(n_batches):
                chunk = edges[i::n_batches]
                if not chunk:
                    continue
                cc_ingest_batch(
                    spark.createDataFrame(chunk, "src string, dst string"),
                    f"{d}/labels",
                )
            assert _batch_state(spark, f"{d}/labels") == _expected(spark, edges), (
                f"split into {n_batches} batches diverged from batch CC"
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_incremental_cc_merges_previously_separate_components(spark):
    d = tempfile.mkdtemp(prefix="kb_cc_")
    try:
        # two disjoint chains, then one bridging edge
        b1 = [("a1", "a2"), ("a2", "a3")]
        b2 = [("b1", "b2"), ("b2", "b3")]
        bridge = [("a3", "b1")]
        for batch in (b1, b2):
            cc_ingest_batch(
                spark.createDataFrame(batch, "src string, dst string"),
                f"{d}/labels",
            )
        mid = dict(_batch_state(spark, f"{d}/labels"))
        assert mid["a3"] == "a1" and mid["b3"] == "b1"
        cc_ingest_batch(
            spark.createDataFrame(bridge, "src string, dst string"),
            f"{d}/labels",
        )
        final = dict(_batch_state(spark, f"{d}/labels"))
        assert set(final.values()) == {"a1"}  # one component, min-key label
        # differential: networkx agrees on the component structure
        g = nx.Graph(b1 + b2 + bridge)
        assert len(list(nx.connected_components(g))) == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_wrapper_matches_sequential_replay(spark):
    edges = _random_edges(77, 25, 45)
    d = tempfile.mkdtemp(prefix="kb_cc_")
    try:
        spark.createDataFrame(edges, "src string, dst string").repartitionByRange(
            3, "src"
        ).write.mode("overwrite").parquet(f"{d}/edges")
        for i, p in enumerate(sorted(glob.glob(f"{d}/edges/part-*"))):
            os.utime(p, (2_000_000 + i, 2_000_000 + i))
        stream = (
            spark.readStream.schema("src string, dst string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/edges")
        )
        q = cc_ingest_to_parquet(stream, f"{d}/labels", f"{d}/ckpt")
        q.awaitTermination(180)
        assert _batch_state(spark, f"{d}/labels") == _expected(spark, edges)
    finally:
        shutil.rmtree(d, ignore_errors=True)
