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
from kinbaku_spark.streaming.graph_cc import (
    cc_ingest_batch,
    cc_ingest_to_parquet,
    cc_read_state,
)


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    es = {
        (f"n{rng.randrange(n_nodes):02d}", f"n{rng.randrange(n_nodes):02d}")
        for _ in range(n_edges)
    }
    return sorted((u, v) for u, v in es if u != v)


def _batch_state(spark, labels_dir):
    return sorted(
        (r.key, r.label) for r in cc_read_state(spark, labels_dir).collect()
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


def test_single_batch_long_path_converges(spark):
    """The round-4 hazard shape: ONE batch whose contraction chain far
    exceeds the old bounded kernel's 20-round cap (a 300-hop path). The
    convergent kernel (pointer doubling, O(log d) rounds) must reach the
    true fixpoint; the old kernel returned silently-wrong labels here."""
    n = 300
    edges = [(f"p{i:04d}", f"p{i + 1:04d}") for i in range(n)]
    d = tempfile.mkdtemp(prefix="kb_cc_")
    try:
        cc_ingest_batch(
            spark.createDataFrame(edges, "src string, dst string"),
            f"{d}/labels",
        )
        state = dict(_batch_state(spark, f"{d}/labels"))
        assert len(state) == n + 1
        assert set(state.values()) == {"p0000"}, (
            "long-path contraction chain did not converge to the min label"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_long_chain_grown_across_batches(spark):
    """Adversarial diameter drill (VERDICT r04 next-round #6, small form):
    a long path ingested in interleaved batches so every batch re-merges
    previously separate chains; state equals NetworkX CC after EVERY
    batch."""
    n = 120
    edges = [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(n)]
    rng = random.Random(5)
    rng.shuffle(edges)
    batches = [edges[i::4] for i in range(4)]
    d = tempfile.mkdtemp(prefix="kb_cc_")
    seen = []
    try:
        for batch in batches:
            cc_ingest_batch(
                spark.createDataFrame(batch, "src string, dst string"),
                f"{d}/labels",
            )
            seen.extend(batch)
            g = nx.Graph(seen)
            want = sorted(
                (node, min(comp))
                for comp in nx.connected_components(g)
                for node in comp
            )
            assert _batch_state(spark, f"{d}/labels") == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_crash_between_write_and_commit_preserves_prior_state(spark):
    """ADVICE r04: the versioned commit must leave the PREVIOUS state
    readable if a batch dies before the pointer swing. Simulate the crash
    window by writing an orphan version directory without moving
    _CURRENT, then re-run the batch and verify convergence."""
    d = tempfile.mkdtemp(prefix="kb_cc_")
    try:
        cc_ingest_batch(
            spark.createDataFrame([("a", "b")], "src string, dst string"),
            f"{d}/labels",
        )
        before = _batch_state(spark, f"{d}/labels")
        # orphan version dir: a crashed batch's partial output
        os.makedirs(f"{d}/labels/state_v999999/garbage", exist_ok=True)
        assert _batch_state(spark, f"{d}/labels") == before
        # replayed batch (streaming checkpoint semantics) re-merges fine
        cc_ingest_batch(
            spark.createDataFrame([("b", "c")], "src string, dst string"),
            f"{d}/labels",
        )
        assert dict(_batch_state(spark, f"{d}/labels")) == {
            "a": "a",
            "b": "a",
            "c": "a",
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_legacy_flat_state_raises_instead_of_silently_resetting(spark):
    """Review finding: a pre-versioning flat-parquet state directory must
    RAISE (with migration instructions), not be treated as empty."""
    import pytest

    d = tempfile.mkdtemp(prefix="kb_cc_legacy_")
    try:
        spark.createDataFrame(
            [("a", "a")], "key string, label string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/labels")
        with pytest.raises(ValueError, match="legacy"):
            cc_ingest_batch(
                spark.createDataFrame([("a", "b")], "src string, dst string"),
                f"{d}/labels",
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_read_state_handle_survives_one_commit(spark):
    """GC keeps one superseded version: a lazy cc_read_state handle taken
    before an ingest still collects afterwards (and older versions are
    gone after two)."""
    d = tempfile.mkdtemp(prefix="kb_cc_grace_")
    try:
        cc_ingest_batch(
            spark.createDataFrame([("a", "b")], "src string, dst string"),
            f"{d}/labels",
        )
        handle = cc_read_state(spark, f"{d}/labels")
        cc_ingest_batch(
            spark.createDataFrame([("c", "d")], "src string, dst string"),
            f"{d}/labels",
        )
        assert sorted((r.key, r.label) for r in handle.collect()) == [
            ("a", "a"),
            ("b", "a"),
        ]
        cc_ingest_batch(
            spark.createDataFrame([("e", "f")], "src string, dst string"),
            f"{d}/labels",
        )
        vers = sorted(
            e for e in os.listdir(f"{d}/labels") if e.startswith("state_v")
        )
        assert len(vers) == 2  # current + one grace version
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dangling_pointer_raises_instead_of_silently_resetting(spark):
    """ADVICE r05: a _CURRENT pointer naming a missing directory is
    corruption — treating it as empty would let the next commit GC every
    surviving state version. It must raise, like the legacy-layout case."""
    import pytest

    d = tempfile.mkdtemp(prefix="kb_cc_dangling_")
    try:
        for batch in ([("a", "b")], [("x", "y")]):
            cc_ingest_batch(
                spark.createDataFrame(batch, "src string, dst string"),
                f"{d}/labels",
            )
        with open(f"{d}/labels/_CURRENT") as f:
            current = f.read().strip()
        shutil.rmtree(f"{d}/labels/{current}")
        with pytest.raises(ValueError, match="corrupt"):
            cc_read_state(spark, f"{d}/labels")
        with pytest.raises(ValueError, match="corrupt"):
            cc_ingest_batch(
                spark.createDataFrame([("b", "c")], "src string, dst string"),
                f"{d}/labels",
            )
        # the surviving grace version was NOT GC'd by the failed ingest
        assert any(
            e.startswith("state_v") for e in os.listdir(f"{d}/labels")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_retention_knob_two_commit_lag(spark):
    """VERDICT r05 #8: retention is configurable. At the default window a
    reader lagging TWO commits fails loudly at collect (its version dir is
    gone); at retain_versions=2 the same two-commit-lag handle survives."""
    import pytest
    from py4j.protocol import Py4JJavaError

    batches = [[("a", "b")], [("c", "d")], [("e", "f")]]
    # default retention=1: handle taken before two further ingests raises
    d = tempfile.mkdtemp(prefix="kb_cc_lag_")
    try:
        cc_ingest_batch(
            spark.createDataFrame(batches[0], "src string, dst string"),
            f"{d}/labels",
        )
        handle = cc_read_state(spark, f"{d}/labels")
        for b in batches[1:]:
            cc_ingest_batch(
                spark.createDataFrame(b, "src string, dst string"),
                f"{d}/labels",
            )
        with pytest.raises(Py4JJavaError):
            handle.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # retain_versions=2: the same lag pattern still reads the old version
    d = tempfile.mkdtemp(prefix="kb_cc_lag2_")
    try:
        cc_ingest_batch(
            spark.createDataFrame(batches[0], "src string, dst string"),
            f"{d}/labels",
            retain_versions=2,
        )
        handle = cc_read_state(spark, f"{d}/labels")
        for b in batches[1:]:
            cc_ingest_batch(
                spark.createDataFrame(b, "src string, dst string"),
                f"{d}/labels",
                retain_versions=2,
            )
        assert sorted((r.key, r.label) for r in handle.collect()) == [
            ("a", "a"),
            ("b", "a"),
        ]
        vers = [
            e for e in os.listdir(f"{d}/labels") if e.startswith("state_v")
        ]
        assert len(vers) == 3  # current + two grace versions
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gc_grace_window_survives_six_digit_rollover(spark):
    """Version 999999 -> 1000000 crosses the 6-digit zero-pad width:
    lexicographic name order would classify the REAL grace-window version
    ('state_v999999' > 'state_v1000000' as strings) as a crashed-batch
    orphan and GC it (ADVICE r06 #4); the GC must compare numeric
    versions, matching how ver is derived."""
    from kinbaku_spark.streaming.graph_cc import _commit_state, cc_read_state

    d = tempfile.mkdtemp(prefix="cc_rollover_")
    try:
        state = spark.createDataFrame(
            [("a", "a")], "key string, label string"
        )
        state.write.parquet(os.path.join(d, "state_v999999"))
        with open(os.path.join(d, "_CURRENT"), "w") as f:
            f.write("state_v999999")
        merged = spark.createDataFrame(
            [("a", "a"), ("b", "a")], "key string, label string"
        )
        _commit_state(merged, d, retain_versions=1)
        with open(os.path.join(d, "_CURRENT")) as f:
            assert f.read().strip() == "state_v1000000"
        assert os.path.isdir(os.path.join(d, "state_v999999")), (
            "grace-window version GC'd on the 6->7 digit rollover"
        )
        assert sorted(
            (r.key, r.label) for r in cc_read_state(spark, d).collect()
        ) == [("a", "a"), ("b", "a")]
    finally:
        shutil.rmtree(d, ignore_errors=True)
