"""Property tests for operators/components.py on random digraphs:
soundness at ANY round budget, exactness at convergence budgets — the
claims the bounded-SCC docstring makes, checked against NetworkX."""

from __future__ import annotations

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from kinbaku_spark.graph import Graph
from kinbaku_spark.operators.components import (
    densest_subgraph_trace,
    katz_scores,
    scc_bounded,
    walk_counts,
)

# deterministic "random" digraph family (seeded stdlib RNG — the repo's
# engine paths never use RNG; tests may)
CASES = [
    (seed, n_nodes, n_edges)
    for seed, n_nodes, n_edges in [
        (1, 8, 14),
        (2, 12, 25),
        (3, 15, 40),
        (4, 10, 9),   # sparse: mostly singletons
        (5, 6, 30),   # dense: one big SCC likely
    ]
]


def _edges_df(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    es = {
        (f"n{rng.randrange(n_nodes):02d}", f"n{rng.randrange(n_nodes):02d}")
        for _ in range(n_edges)
    }
    es = sorted((u, v) for u, v in es if u != v)
    return (
        spark.createDataFrame(es, "src string, dst string"),
        nx.DiGraph(es),
    )


@pytest.mark.parametrize("seed,n_nodes,n_edges", CASES)
def test_scc_sound_at_small_budget(spark, seed, n_nodes, n_edges):
    edges, g = _edges_df(spark, seed, n_nodes, n_edges)
    true_sccs = {n: frozenset(c) for c in nx.strongly_connected_components(g) for n in c}

    # small budget: SOUND — every certified group inside one true SCC
    rows = scc_bounded(edges, prop_rounds=1, peels=1).collect()
    assert sorted(r.key for r in rows) == sorted(g.nodes)
    groups: dict[str, set] = {}
    for r in rows:
        if r.peel is not None:
            groups.setdefault(r.comp, set()).add(r.key)
    for comp, members in groups.items():
        assert members <= true_sccs[comp]


# convergence is O(peels·rounds) Spark rounds — assert exactness on the two
# smallest graphs only (the dense one exercises a big SCC, the sparse one
# many singleton SCCs); soundness above covers the rest
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(5, 6, 30), (1, 8, 14)])
def test_scc_exact_at_convergence_budget(spark, seed, n_nodes, n_edges):
    edges, g = _edges_df(spark, seed, n_nodes, n_edges)
    # convergence budget (rounds, peels >= |V|): EXACT SCC partition,
    # every group labeled by its min key
    rows = scc_bounded(edges, prop_rounds=len(g), peels=len(g)).collect()
    assert all(r.peel is not None for r in rows)
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r.comp, set()).add(r.key)
    want = {min(c): set(c) for c in nx.strongly_connected_components(g)}
    assert got == want


def test_katz_and_walks_match_networkx_adjacency_powers(spark):
    edges, g = _edges_df(spark, 9, 10, 22)
    und = nx.Graph(g)
    nodes = sorted(und.nodes)
    idx = {k: i for i, k in enumerate(nodes)}
    import numpy as np

    a = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for u, v in und.edges:
        a[idx[u], idx[v]] = 1
        a[idx[v], idx[u]] = 1
    s = np.ones(len(nodes), dtype=np.int64)
    w = np.ones(len(nodes), dtype=np.int64)
    for t in range(1, 4):
        s = a @ s + 8**t
        w = a @ w
    # NOTE: the operator symmetrizes (src, dst) by UNION ALL — a digraph
    # with both (u, v) and (v, u) would double those edges, so feed it the
    # canonical undirected orientation here
    canon = spark.createDataFrame(
        sorted((u, v) for u, v in und.edges), "src string, dst string"
    )
    got_s = {r.key: r.katz_scaled for r in katz_scores(canon).collect()}
    got_w = {r.key: r.walks for r in walk_counts(canon).collect()}
    assert got_s == {k: int(s[idx[k]]) for k in nodes}
    assert got_w == {k: int(w[idx[k]]) for k in nodes}


def test_densest_trace_python_replay(spark):
    edges, g = _edges_df(spark, 12, 12, 30)
    e = {(u, v) for u, v in g.edges}
    trace = []
    for r in range(4):
        deg: dict[str, int] = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        v, m = len(deg), len(e)
        trace.append((r, v, m, m * 1_000_000 // v if v else None))
        keep = {n for n, d in deg.items() if d * v * 10 > 22 * m}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    got = sorted(
        (r["round"], r.n_nodes, r.n_edges, r.density_ppm)
        for r in densest_subgraph_trace(edges, peel_rounds=4).collect()
    )
    assert got == trace


def test_graph_facade_methods_delegate(spark):
    edges, g = _edges_df(spark, 20, 8, 16)
    gr = Graph.from_edges(edges.withColumn("type", F.lit(0)))
    assert sorted(r.key for r in gr.scc_bounded().collect()) == sorted(g.nodes)
    assert {r.key for r in gr.katz_centrality(rounds=1).collect()} == set(g.nodes)
    assert {r.key for r in gr.eigenvector_walks(rounds=1).collect()} == set(g.nodes)
    assert gr.densest_subgraph(peel_rounds=2).count() == 2
