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
