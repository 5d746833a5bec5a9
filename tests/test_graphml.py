"""GraphML / NetworkX / edge-list interchange: roundtrips through our own
reader/writer AND differentials against NetworkX's GraphML implementation
(our writer's output must parse identically in nx.read_graphml; nx-written
files must load identically through read_graphml)."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from kinbaku_spark.graph import Graph
from kinbaku_spark.sources.graphml import (
    from_networkx,
    read_edgelist,
    read_graphml,
    to_networkx,
    write_edgelist,
    write_graphml,
)

EDGES = [
    ("a", "b", 0, 1.5),
    ("b", "c", 1, 2.25),
    ("c", "a", 0, -0.5),
    ("a", "d", 2, 0.0),
]


@pytest.fixture()
def small_graph(spark):
    return Graph.from_edges(
        spark.createDataFrame(EDGES, "src string, dst string, type int, weight double")
    )


def _edge_set(g: Graph):
    return {
        (r.src, r.dst, r.type, r.weight)
        for r in g.edges_df.select("src", "dst", "type", "weight").collect()
    }


def test_graphml_roundtrip_own_reader(spark, small_graph, tmp_path):
    p = str(tmp_path / "g.graphml")
    write_graphml(small_graph, p)
    back = read_graphml(spark, p)
    assert _edge_set(back) == _edge_set(small_graph)
    assert {r.key for r in back.nodes_df.collect()} == {"a", "b", "c", "d"}


def test_graphml_written_file_parses_in_networkx(spark, small_graph, tmp_path):
    p = str(tmp_path / "g.graphml")
    write_graphml(small_graph, p)
    nxg = nx.read_graphml(p)
    assert isinstance(nxg, nx.DiGraph)
    assert set(nxg.nodes) == {"a", "b", "c", "d"}
    for src, dst, typ, w in EDGES:
        d = nxg.edges[src, dst]
        assert d["type"] == typ
        assert d["weight"] == w


def test_networkx_written_file_loads_identically(spark, tmp_path):
    rng = random.Random(7)
    nxg = nx.DiGraph()
    for _ in range(40):
        u, v = f"n{rng.randrange(15)}", f"n{rng.randrange(15)}"
        nxg.add_edge(u, v, weight=round(rng.random(), 6), type=rng.randrange(3))
    nxg.add_node("lonely", score=3.5)
    p = str(tmp_path / "nx.graphml")
    nx.write_graphml(nxg, p)
    g = read_graphml(spark, p)
    assert {r.key for r in g.nodes_df.collect()} == set(nxg.nodes)
    got = {
        (r.src, r.dst): (r.type, r.weight)
        for r in g.edges_df.select("src", "dst", "type", "weight").collect()
    }
    assert got == {
        (u, v): (d["type"], d["weight"]) for u, v, d in nxg.edges(data=True)
    }
    lonely = g.nodes_df.filter("key = 'lonely'").collect()[0]
    assert lonely.score == 3.5


def test_networkx_object_bridge_roundtrip(spark, small_graph):
    nxg = to_networkx(small_graph)
    assert set(nxg.nodes) == {"a", "b", "c", "d"}
    back = from_networkx(spark, nxg)
    assert _edge_set(back) == _edge_set(small_graph)
    # attrs survive the object hop
    assert nxg.edges["b", "c"]["weight"] == 2.25


def test_graphml_escapes_xml_metacharacters(spark, tmp_path):
    g = Graph.from_edges(
        spark.createDataFrame(
            [('<k&"1">', "v'2", 0, 1.0)],
            "src string, dst string, type int, weight double",
        )
    )
    p = str(tmp_path / "esc.graphml")
    write_graphml(g, p)
    nxg = nx.read_graphml(p)
    assert set(nxg.nodes) == {'<k&"1">', "v'2"}
    back = read_graphml(spark, p)
    assert {r.key for r in back.nodes_df.collect()} == {'<k&"1">', "v'2"}


def test_graphml_rejects_unrepresentable_columns(spark):
    from pyspark.sql import functions as F

    g = Graph.from_edges(
        spark.createDataFrame([("a", "b", 0)], "src string, dst string, type int")
    )
    bad = Graph(
        g.spark,
        nodes=g.nodes_df.withColumn("vec", F.array(F.lit(1))),
        edges=g.edges_df,
    )
    with pytest.raises(ValueError, match="GraphML cannot carry"):
        write_graphml(bad, "/dev/null")


def test_edgelist_roundtrip_distributed(spark, small_graph, tmp_path):
    p = str(tmp_path / "edges_dir")
    write_edgelist(small_graph, p)
    back = read_edgelist(spark, p)
    got = {
        (r.src, r.dst, r.weight)
        for r in back.edges_df.select("src", "dst", "weight").collect()
    }
    assert got == {(s, d, w) for s, d, _t, w in EDGES}
    # and NetworkX can read the concatenated part files
    import glob

    lines = []
    for part in glob.glob(f"{p}/part-*"):
        lines += open(part).read().splitlines()
    nxg = nx.parse_edgelist(lines, create_using=nx.DiGraph, data=(("weight", float),))
    assert set(nxg.edges) == {(s, d) for s, d, _t, _w in EDGES}


def test_undirected_graphml_symmetrizes(spark, tmp_path):
    """ADVICE r04: an nx.Graph written by networkx (edgedefault=
    "undirected") must load with BOTH orientations so neighbor/degree/
    component queries agree with NetworkX's reading of the same file."""
    import networkx as nx

    g = nx.Graph()
    g.add_edge("a", "b", weight=2.0)
    g.add_edge("b", "c", weight=3.0)
    p = str(tmp_path / "und.graphml")
    nx.write_graphml(g, p)
    back = read_graphml(spark, p)
    assert sorted(back.neighbors("b")) == ["a", "c"]
    assert sorted(back.predecessors("b")) == ["a", "c"]
    assert back.out_degree("b") == 2 == g.degree("b")
    # edge attrs survive on both orientations
    assert back.edge("b", "a")["weight"] == 2.0
    assert back.edge("a", "b")["weight"] == 2.0


def test_directed_graphml_stays_directed(spark, tmp_path):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edge("a", "b")
    p = str(tmp_path / "dir.graphml")
    nx.write_graphml(g, p)
    back = read_graphml(spark, p)
    assert list(back.neighbors("a")) == ["b"]
    assert list(back.neighbors("b")) == []


def test_shared_attr_name_typed_per_scope(spark, tmp_path):
    """ADVICE r04: a node key and an edge key sharing attr.name with
    DIFFERENT attr.types must each keep their own type (the old map keyed
    by name alone mistyped one of the two columns)."""
    p = str(tmp_path / "scoped.graphml")
    with open(p, "w") as f:
        f.write(
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
            '  <key id="d0" for="node" attr.name="score" attr.type="long"/>\n'
            '  <key id="d1" for="edge" attr.name="score" attr.type="double"/>\n'
            '  <graph edgedefault="directed">\n'
            '    <node id="a"><data key="d0">7</data></node>\n'
            '    <node id="b"/>\n'
            '    <edge source="a" target="b"><data key="d1">0.5</data></edge>\n'
            "  </graph>\n</graphml>\n"
        )
    back = read_graphml(spark, p)
    assert dict(back.nodes_df.dtypes)["score"] == "bigint"
    assert dict(back.edges_df.dtypes)["score"] == "double"
    assert back.node("a")["score"] == 7
    assert back.edge("a", "b")["score"] == 0.5


def test_undirected_write_read_roundtrip_stable(spark, tmp_path):
    """Review finding: a symmetrized (read-from-undirected) graph written
    back with directed=False must emit ONE edge per unordered pair, so the
    write->read round trip is stable instead of doubling edges."""
    import networkx as nx

    g = nx.Graph()
    g.add_edge("a", "b", weight=2.0)
    g.add_edge("b", "c", weight=3.0)
    p1, p2 = str(tmp_path / "r1.graphml"), str(tmp_path / "r2.graphml")
    nx.write_graphml(g, p1)
    loaded = read_graphml(spark, p1)  # stores both orientations
    assert loaded.n_edges == 4
    write_graphml(loaded, p2, directed=False)
    again = read_graphml(spark, p2)
    assert again.n_edges == 4  # stable, not 8
    assert sorted(again.neighbors("b")) == ["a", "c"]
    # networkx reads our undirected output identically
    nxg = nx.read_graphml(p2)
    assert not nxg.is_directed() and sorted(nxg.edges()) == sorted(g.edges())


def test_per_edge_directed_numeric_form(spark, tmp_path):
    """xs:boolean '1' counts as directed=true on a per-edge override."""
    p = str(tmp_path / "num.graphml")
    with open(p, "w") as f:
        f.write(
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
            '  <graph edgedefault="undirected">\n'
            '    <node id="a"/><node id="b"/><node id="c"/>\n'
            '    <edge source="a" target="b" directed="1"/>\n'
            '    <edge source="b" target="c"/>\n'
            "  </graph>\n</graphml>\n"
        )
    back = read_graphml(spark, p)
    assert list(back.neighbors("b")) == ["c"]  # a->b NOT symmetrized
    assert sorted(back.predecessors("b")) == ["a", "c"]
