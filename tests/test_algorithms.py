"""Graph algorithms + skew utilities: differential vs NetworkX and direct
aggregation."""

from __future__ import annotations

import random

import networkx as nx
from pyspark.sql import functions as F

from kinbaku_spark.graph import Graph
from kinbaku_spark.operators.skew import salted_agg, salted_count, salted_join


def test_connected_components_vs_networkx(spark):
    rng = random.Random(11)
    edges = {(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}") for _ in range(55)}
    g = Graph.from_edges(
        spark.createDataFrame(
            [(u, v, 0) for u, v in sorted(edges)], "src string, dst string, type int"
        )
    )
    got: dict[str, set] = {}
    for r in g.connected_components().collect():
        got.setdefault(r["component"], set()).add(r["key"])
    nxg = nx.Graph()
    nxg.add_edges_from(edges)
    want = {frozenset(c) for c in nx.connected_components(nxg)}
    assert {frozenset(c) for c in got.values()} == want
    # representative is the min key of its component
    for rep, members in got.items():
        assert rep == min(members)


def test_salted_count_equals_direct(spark):
    # skewed: one hub key with 5000 rows, 50 cold keys
    hub = spark.range(5000).select(F.lit("hub").alias("k"))
    cold = spark.range(50).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    df = hub.union(cold)
    got = {r["k"]: r["count"] for r in salted_count(df, ["k"]).collect()}
    want = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_agg_equals_direct(spark):
    df = spark.range(2000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    got = {r["k"]: r["sum_v"] for r in salted_agg(df, ["k"], "v").collect()}
    want = {
        r["k"]: float(r["s"])
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).alias("s"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_direct(spark):
    facts = spark.range(3000).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "k long, name string")
    got = salted_join(facts, dim, "k")
    want = facts.join(dim, "k")
    assert got.count() == want.count() == 3000
    assert got.groupBy("name").count().orderBy("name").collect() == \
        want.groupBy("name").count().orderBy("name").collect()


# -- training-data plumbing invariants (pipeline_ext wave) -------------------

def _docs_df(spark, sf_dir):
    from kinbaku_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_stratified_sample_partition_invariant(spark, sf_dir):
    """Sample membership is a pure function of doc_id — identical under any
    repartitioning (the property rand()-based sampling lacks)."""
    from kinbaku_spark.operators.pipeline import stratified_sample

    docs = _docs_df(spark, sf_dir)
    a = stratified_sample(docs, rates={"en": 0.2}, default_rate=0.6)
    b = stratified_sample(
        docs.repartition(7, "source"), rates={"en": 0.2}, default_rate=0.6
    )
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b and len(rows_a) > 0
    # every stratum respects its cut
    assert a.filter((F.col("lang") == "en") & (F.col("bucket") >= 200)).count() == 0
    assert a.filter((F.col("lang") != "en") & (F.col("bucket") >= 600)).count() == 0
    assert {r["split"] for r in a.select("split").distinct().collect()} \
        <= {"train", "val", "test"}


def test_pack_sequences_covers_all_docs_exactly_once(spark, sf_dir):
    """Chunking is a partition of each shard: doc counts and token totals
    are conserved, chunk ids are dense from 0 per shard."""
    from kinbaku_spark.operators.pipeline import pack_sequences
    from kinbaku_spark.operators.text import TOKEN_PATTERN

    docs = _docs_df(spark, sf_dir)
    packed = pack_sequences(docs, capacity=512).collect()
    n_docs = sum(r["n_docs"] for r in packed)
    assert n_docs == docs.count()
    tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0))
    total = docs.select(F.sum(tokens).alias("t")).collect()[0]["t"]
    assert sum(r["sum_tokens"] for r in packed) == total
    per_shard: dict[str, list[int]] = {}
    for r in packed:
        per_shard.setdefault(r["source"], []).append(r["chunk_id"])
    for chunks in per_shard.values():
        assert sorted(chunks) == list(range(len(chunks)))


def test_contamination_detects_planted_near_dups(spark, sf_dir):
    """Near-identical doc pairs that straddle the train/eval source split
    must surface as contamination hits."""
    from kinbaku_spark.operators.pipeline import cross_split_contamination

    docs = _docs_df(spark, sf_dir)
    train = [f"src{i}" for i in range(10)]
    ev = [f"src{i}" for i in range(10, 20)]
    hits = cross_split_contamination(docs, train, ev).collect()
    assert all(r["n_eval_docs"] >= 1 and r["n_shared_grams"] >= 1 for r in hits)
    # symmetric run (swapped splits) must find the mirror image
    mirror = cross_split_contamination(docs, ev, train).collect()
    assert (len(hits) > 0) == (len(mirror) > 0)


def test_video_frames_partition_each_payload(spark, sf_dir):
    """Frame sampling is a partition of the payload bytes: per-doc
    frame_bytes sum to the payload size, frame indexes are dense from 0
    (no byte dropped or double-counted; checksum parity is covered by the
    DuckDB oracle)."""
    from kinbaku_spark.operators.multimodal import (
        video_frame_samples,
        with_binary_payload,
    )

    docs = with_binary_payload(_docs_df(spark, sf_dir))
    frames = video_frame_samples(docs, every_ms=200)
    got = {
        r["doc_id"]: (r["b"], r["nf"], r["maxi"])
        for r in frames.groupBy("doc_id")
        .agg(
            F.sum("frame_bytes").alias("b"),
            F.count(F.lit(1)).alias("nf"),
            F.max("frame_idx").alias("maxi"),
        )
        .collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.octet_length("payload").alias("n")).collect()
    }
    assert set(got) == set(want)
    for d, (total, nf, maxi) in got.items():
        assert total == want[d], d
        assert maxi == nf - 1, d
