"""NetworkX / GraphML / edge-list interchange.

The reference (kerighan/kinbaku) positions itself as an on-disk
NetworkX-style graph store (README.md — the API mirrors
``G.add_edge``/``G.neighbors``), so its users' graphs live in NetworkX
objects and the formats NetworkX speaks; this module is the migration
path: ``from_networkx``/``to_networkx`` object bridges plus GraphML and
edge-list file formats. The reference itself reads/writes only its own
binary format (graph.py:282-331, covered by sources/kinbaku_file.py).

Scale contract, explicit per format:

- GraphML is an XML interop format — inherently single-file,
  driver-materialized BOTH ways (same documented parity contract as
  ``adjacency_matrix``/``to_kinbaku_file``: a deliberate small-graph
  convenience, not the storage path). At 100 TB the stored graph stays in
  the lake formats (sources/io.py, bucketed parquet).
- The edge-list text format IS distributed both ways: the writer is a
  plain ``DataFrameWriter.csv`` (one part file per task), the reader a
  schema-pinned ``spark.read.csv`` — fine for bulk interop at any scale.
- ``to_networkx`` collects; ``from_networkx`` parallelizes a driver-side
  object — both are bridges for graphs that already fit in one Python
  process by definition of being NetworkX objects.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from kinbaku_spark.graph import Graph

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"

# Spark simple dtype -> GraphML attr.type (the NetworkX-compatible subset)
_TO_GRAPHML_TYPE = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}
_FROM_GRAPHML_TYPE = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}
_PY_CAST = {
    "int": int,
    "long": int,
    "float": float,
    "double": float,
    "string": str,
    "boolean": lambda s: s in ("true", "True", "1"),
}


def _attr_cols(df: DataFrame, skip: tuple) -> list[tuple[str, str]]:
    out = []
    for name, dtype in df.dtypes:
        if name in skip:
            continue
        if dtype not in _TO_GRAPHML_TYPE:
            raise ValueError(
                f"GraphML cannot carry column {name!r} of type {dtype!r};"
                f" supported scalar types: {sorted(_TO_GRAPHML_TYPE)}"
            )
        out.append((name, dtype))
    return out


def _fmt(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def write_graphml(g: Graph, path: str, directed: bool = True) -> None:
    """Write the graph as GraphML readable by ``networkx.read_graphml``.

    Every non-key node column and non-(src, dst) edge column becomes a
    declared ``<key>`` with its Spark type mapped to the GraphML attr
    type. Rows stream through ``toLocalIterator`` so the driver holds one
    partition at a time, but the OUTPUT is one XML file — use the lake
    formats for graphs that don't fit a file (module docstring).
    """
    node_attrs = _attr_cols(g.nodes_df, skip=("key",))
    edge_attrs = _attr_cols(g.edges_df, skip=("src", "dst"))
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(f'<graphml xmlns="{_GRAPHML_NS}">\n')
        for i, (name, dtype) in enumerate(node_attrs):
            f.write(
                f'  <key id="dn{i}" for="node" attr.name={quoteattr(name)}'
                f' attr.type="{_TO_GRAPHML_TYPE[dtype]}"/>\n'
            )
        for i, (name, dtype) in enumerate(edge_attrs):
            f.write(
                f'  <key id="de{i}" for="edge" attr.name={quoteattr(name)}'
                f' attr.type="{_TO_GRAPHML_TYPE[dtype]}"/>\n'
            )
        kind = "directed" if directed else "undirected"
        f.write(f'  <graph edgedefault="{kind}">\n')
        # undirected writes emit ONE <edge> per unordered endpoint pair:
        # a graph loaded via read_graphml stores both orientations (its
        # symmetrization), so writing every row would double edges on the
        # next read — the write->read round trip must be stable
        seen_pairs: set = set()
        for row in g.nodes_df.toLocalIterator():
            f.write(f"    <node id={quoteattr(str(row['key']))}")
            datas = [
                (i, row[name])
                for i, (name, _) in enumerate(node_attrs)
                if row[name] is not None
            ]
            if not datas:
                f.write("/>\n")
                continue
            f.write(">")
            for i, v in datas:
                f.write(f'<data key="dn{i}">{escape(_fmt(v))}</data>')
            f.write("</node>\n")
        for row in g.edges_df.toLocalIterator():
            if not directed:
                pair = frozenset((str(row["src"]), str(row["dst"])))
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
            f.write(
                f"    <edge source={quoteattr(str(row['src']))}"
                f" target={quoteattr(str(row['dst']))}"
            )
            datas = [
                (i, row[name])
                for i, (name, _) in enumerate(edge_attrs)
                if row[name] is not None
            ]
            if not datas:
                f.write("/>\n")
                continue
            f.write(">")
            for i, v in datas:
                f.write(f'<data key="de{i}">{escape(_fmt(v))}</data>')
            f.write("</edge>\n")
        f.write("  </graph>\n</graphml>\n")


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """Read a GraphML file (ours or NetworkX-written) into a Graph.

    Declared ``<key>`` elements type the attribute columns (schema pinned
    — never inferred); ``<default>`` values apply where an element carries
    no ``<data>``. Node ids become the string ``key`` column, matching
    NetworkX's own read_graphml semantics. An ``edgedefault="undirected"``
    graph (what ``networkx.write_graphml`` emits for ``nx.Graph``) is
    SYMMETRIZED on read — one stored edge per direction — so
    neighbor/degree/component queries agree with NetworkX's reading of the
    same file; per-edge ``directed`` overrides are honored both ways.
    Attribute types are keyed by (``for``, ``attr.name``): a node key and
    an edge key may share a name with different types (ADVICE r04).
    """
    ns = {"g": _GRAPHML_NS}
    root = ET.parse(path).getroot()
    keys: dict[str, tuple[str, str, str, Any]] = {}  # id -> (for, name, type, default)
    for k in root.findall("g:key", ns):
        d = k.find("g:default", ns)
        typ = k.get("attr.type", "string")
        default = _PY_CAST[typ](d.text) if d is not None and d.text is not None else None
        keys[k.get("id")] = (k.get("for", "all"), k.get("attr.name"), typ, default)

    def attrs_of(elem, kind: str) -> dict[str, Any]:
        vals = {
            name: default
            for _id, (f_, name, _t, default) in keys.items()
            if f_ in (kind, "all") and default is not None
        }
        for d in elem.findall("g:data", ns):
            meta = keys.get(d.get("key"))
            if meta is None:
                continue
            _f, name, typ, _default = meta
            vals[name] = _PY_CAST[typ](d.text) if d.text is not None else None
        return vals

    graph = root.find("g:graph", ns)
    undirected_default = graph.get("edgedefault", "directed") == "undirected"
    node_fields = sorted(
        {name for f_, name, _t, _d in keys.values() if f_ in ("node", "all")}
    )
    edge_fields = sorted(
        {name for f_, name, _t, _d in keys.values() if f_ in ("edge", "all")}
    )
    # type map keyed by (for, name): a node key and an edge key sharing a
    # name with different attr.types must not mistype each other's column
    types_by_scope = {(f_, name): typ for f_, name, typ, _d in keys.values()}

    def _type_of(kind: str, name: str) -> str:
        return types_by_scope.get((kind, name)) or types_by_scope.get(
            ("all", name), "string"
        )

    node_rows, edge_rows = [], []
    for n in graph.findall("g:node", ns):
        a = attrs_of(n, "node")
        node_rows.append(tuple([n.get("id")] + [a.get(f) for f in node_fields]))
    for e in graph.findall("g:edge", ns):
        a = attrs_of(e, "edge")
        row = tuple([e.get("source"), e.get("target")] + [a.get(f) for f in edge_fields])
        edge_rows.append(row)
        # edgedefault=undirected (per-edge `directed` overrides honored):
        # store both orientations so traversals match NetworkX's reading
        per_edge = e.get("directed")
        # xs:boolean lexical forms: both "true" and "1" are true
        directed = (
            per_edge in ("true", "1")
            if per_edge is not None
            else not undirected_default
        )
        if not directed and row[0] != row[1]:
            edge_rows.append(tuple([row[1], row[0]] + list(row[2:])))
    node_schema = T.StructType(
        [T.StructField("key", T.StringType(), False)]
        + [
            T.StructField(f, _FROM_GRAPHML_TYPE[_type_of("node", f)], True)
            for f in node_fields
        ]
    )
    edge_schema = T.StructType(
        [
            T.StructField("src", T.StringType(), False),
            T.StructField("dst", T.StringType(), False),
        ]
        + [
            T.StructField(f, _FROM_GRAPHML_TYPE[_type_of("edge", f)], True)
            for f in edge_fields
        ]
    )
    nodes = spark.createDataFrame(node_rows, node_schema)
    edges = spark.createDataFrame(edge_rows, edge_schema)
    if "type" not in edges.columns:
        edges = edges.withColumn("type", F.lit(0))
    return Graph(spark, nodes=nodes, edges=edges)


def to_networkx(g: Graph, directed: bool = True):
    """Collect the graph into a ``networkx.DiGraph`` (or ``Graph``) with
    every non-key/endpoint column as a node/edge attribute. Driver-side by
    nature — the bridge exists for NetworkX-sized graphs."""
    import networkx as nx

    out = nx.DiGraph() if directed else nx.Graph()
    node_attrs = [c for c in g.nodes_df.columns if c != "key"]
    edge_attrs = [c for c in g.edges_df.columns if c not in ("src", "dst")]
    for row in g.nodes_df.toLocalIterator():
        out.add_node(
            row["key"],
            **{a: row[a] for a in node_attrs if row[a] is not None},
        )
    for row in g.edges_df.toLocalIterator():
        out.add_edge(
            row["src"],
            row["dst"],
            **{a: row[a] for a in edge_attrs if row[a] is not None},
        )
    return out


def from_networkx(spark: SparkSession, nxg) -> Graph:
    """Build a Graph from a NetworkX graph. Node ids stringify into
    ``key`` (NetworkX allows any hashable; the engine's key column is a
    string, same canonicalization the reference applies to its str keys).
    Attribute columns are the union of attr names, typed from the first
    non-None value; an undirected input contributes one edge per NetworkX
    edge (its canonical orientation), matching ``Graph.from_edges``'
    directed storage."""
    node_fields = sorted({k for _, d in nxg.nodes(data=True) for k in d})
    edge_fields = sorted({k for _, _, d in nxg.edges(data=True) for k in d})

    def _spark_type(values):
        for v in values:
            if v is None:
                continue
            if isinstance(v, bool):
                return T.BooleanType()
            if isinstance(v, int):
                return T.LongType()
            if isinstance(v, float):
                return T.DoubleType()
            return T.StringType()
        return T.StringType()

    node_schema = T.StructType(
        [T.StructField("key", T.StringType(), False)]
        + [
            T.StructField(
                f, _spark_type(d.get(f) for _, d in nxg.nodes(data=True)), True
            )
            for f in node_fields
        ]
    )
    edge_schema = T.StructType(
        [
            T.StructField("src", T.StringType(), False),
            T.StructField("dst", T.StringType(), False),
        ]
        + [
            T.StructField(
                f, _spark_type(d.get(f) for _, _, d in nxg.edges(data=True)), True
            )
            for f in edge_fields
        ]
    )
    nodes = spark.createDataFrame(
        [tuple([str(n)] + [d.get(f) for f in node_fields]) for n, d in nxg.nodes(data=True)],
        node_schema,
    )
    edges = spark.createDataFrame(
        [
            tuple([str(u), str(v)] + [d.get(f) for f in edge_fields])
            for u, v, d in nxg.edges(data=True)
        ],
        edge_schema,
    )
    if "type" not in edges.columns:
        edges = edges.withColumn("type", F.lit(0))
    return Graph(spark, nodes=nodes, edges=edges)


def write_edgelist(g: Graph, path: str, weighted: bool = True) -> None:
    """Distributed edge-list writer (NetworkX ``write_weighted_edgelist``
    layout: ``src dst [weight]`` space-separated, no header) — a plain
    CSV write, one part file per task."""
    cols = [F.col("src"), F.col("dst")]
    if weighted and "weight" in g.edges_df.columns:
        cols.append(F.col("weight").cast("string"))
    g.edges_df.select(*cols).write.mode("overwrite").csv(path, sep=" ")


def read_edgelist(
    spark: SparkSession, path: str, weighted: bool = True, comment: str = "#"
) -> Graph:
    """Distributed edge-list reader (schema-pinned CSV scan)."""
    schema = "src string, dst string" + (", weight double" if weighted else "")
    edges = spark.read.csv(path, sep=" ", schema=schema, comment=comment)
    return Graph.from_edges(edges)
