"""Directed-graph facade over a pair of DataFrames — the Spark-native
re-expression of the reference's single-file graph database.

Data model (SURVEY.md §1.4):
    nodes(key string, ...attrs)            -- key unique, non-null
    edges(src string, dst string, type int, ...attrs)
                                           -- (src,dst,type) unique; self-loops OK

Reference parity map (each method cites the reference implementation it
re-expresses; the reference walks hand-rolled BSTs inside an mmap'd file —
here every read is declarative DataFrame algebra that Catalyst turns into
pruned, pushed-down parquet scans):

    node/edge/has_node/has_edge   graph.py:999-1099   -> pushed-down filter
    neighbors/predecessors        graph.py:856-884    -> filter + project
    neighbors_from/..._from       graph.py:928-957    -> one shuffle join
    common_neighbors/preds        graph.py:959-983    -> intersect
    out_degree/in_degree          graph.py:985-997    -> count / groupBy
    nodes/edges iteration         graph.py:152-171    -> full scan
    batch_get_nodes/edges         graph.py:1101-1186  -> keyset pagination
    adjacency_matrix/subgraph     graph.py:1188-1265  -> join to dense id map
    add_node/add_edge             graph.py:1353-1524  -> delta-buffer upsert
    remove_edge/remove_node       graph.py:1526-1563  -> delta-buffer delete
    set_neighbors/predecessors    graph.py:886-926    -> set-diff + upsert

Mutation design: the reference mutates records in place and keeps counters in
a header (graph.py:258-276) plus 4 LRU caches (graph.py:100-106). DataFrames
are immutable, so point mutations buffer in a driver-side delta — a dict of
last-op-per-entity — and materialize as ONE anti-join + union per flush
(lineage stays O(flushes), not O(ops)). A driver-side identity index (node
keys + edge triples, the moral equivalent of the reference's preload
(graph.py:304-306)) makes point existence checks O(1).

Scale notes: the identity index is for the reference's point-op API, which is
inherently driver-bound; at 100 TB you use the batch API (`add_edges`,
`remove_edges`, `add_nodes`, `remove_nodes`) — pure join/union transforms with
no driver state — and partition `edges` by `src` (plus a `dst`-bucketed copy
for predecessor-heavy workloads, mirroring the reference's dual out/in trees).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Iterator

from pyspark.sql import DataFrame, Row, SparkSession, Window, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from kinbaku_spark.exceptions import BadArgument, EdgeNotFound, NodeNotFound

EDGE_KEY = ("src", "dst", "type")

# Flush the delta buffer into the DataFrames once it holds this many entries;
# each flush is one union + anti-join, so lineage depth stays bounded.
DEFAULT_FLUSH_EVERY = 50_000
# point-read LRU capacity (reference cache_len default, graph.py:29)
DEFAULT_CACHE_LEN = 1_000_000


def _lru_get(lru: OrderedDict, key):
    rec = lru.get(key)
    if rec is not None:
        lru.move_to_end(key)
    return rec


def _lru_put(lru: OrderedDict, key, rec, cap: int) -> None:
    lru[key] = rec
    lru.move_to_end(key)
    if len(lru) > cap:
        lru.popitem(last=False)


# localCheckpoint() every N flushes to truncate lineage for long op-logs.
CHECKPOINT_EVERY_FLUSHES = 8


def _nullable(schema: StructType, keep: set[str]) -> StructType:
    """Schema copy with every non-identity field nullable (delta upserts may
    omit attributes; the reference fills dataclass defaults, we fill NULL)."""
    return StructType(
        [
            StructField(f.name, f.dataType, f.name not in keep or f.nullable)
            for f in schema
        ]
    )


def _default_nodes_schema() -> StructType:
    return StructType([StructField("key", StringType(), False)])


def _default_edges_schema() -> StructType:
    return StructType(
        [
            StructField("src", StringType(), False),
            StructField("dst", StringType(), False),
            StructField("type", IntegerType(), False),
        ]
    )


class Graph:
    """A directed graph backed by two DataFrames.

    Self-loops are allowed; parallel edges only via distinct ``type``
    (reference: graph.py:1-4).
    """

    def __init__(
        self,
        spark: SparkSession,
        nodes: DataFrame | None = None,
        edges: DataFrame | None = None,
        preload: bool = False,
        flush_every: int = DEFAULT_FLUSH_EVERY,
        cache_len: int = DEFAULT_CACHE_LEN,
    ) -> None:
        self.spark = spark
        self._nodes = nodes if nodes is not None else spark.createDataFrame([], _default_nodes_schema())
        self._edges = edges if edges is not None else spark.createDataFrame([], _default_edges_schema())
        if "key" not in self._nodes.columns:
            raise BadArgument("nodes DataFrame must have a 'key' column")
        for c in EDGE_KEY:
            if c not in self._edges.columns:
                raise BadArgument(f"edges DataFrame must have a '{c}' column")
        # delta buffers: entity -> ("upsert", attrs) | ("delete", None)
        self._node_ops: dict[str, tuple[str, dict | None]] = {}
        self._edge_ops: dict[tuple[str, str, int], tuple[str, dict | None]] = {}
        self._flush_every = flush_every
        self._flushes = 0
        # identity index (reference preload, graph.py:304-306)
        self._node_keys: set[str] | None = None
        self._edge_keys: set[tuple[str, str, int]] | None = None
        # KV front for point reads (reference cache semantics,
        # graph.py:100-106 cache_pos_to_node + preload): full-record driver
        # dicts when preload() ran, else a bounded read-through LRU. Point
        # lookups are the one workload where a distributed scan is the
        # wrong shape (~300 ms/job vs ~ms in the reference); the caches
        # answer repeat reads at dict speed while every bulk/analytic path
        # stays distributed.
        self._cache_len = cache_len
        self._node_rec: dict[str, dict] | None = None
        self._edge_rec: dict[tuple[str, str, int], dict] | None = None
        self._node_lru: OrderedDict[str, dict] = OrderedDict()
        self._edge_lru: OrderedDict[tuple[str, str, int], dict] = OrderedDict()
        # preload-built adjacency dicts (key -> neighbor/predecessor key
        # sets): dict-speed neighbors()/predecessors() for the reference's
        # flagship point read. Invalidated WHOLESALE by any mutation (the
        # per-type multiplicity bookkeeping is not worth the bug surface)
        # and rebuilt by the next preload().
        self._adj: dict[str, set] | None = None
        self._pred: dict[str, set] | None = None
        self._id_map: DataFrame | None = None
        self._id_map_count: int | None = None
        if preload:
            self.preload()

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_edges(cls, edges: DataFrame, preload: bool = False) -> "Graph":
        """Build a graph from an edge DataFrame, deriving the node table from
        the endpoints (the reference auto-creates endpoint nodes on add_edge,
        graph.py:1446-1453)."""
        spark = edges.sparkSession
        if "type" not in edges.columns:
            edges = edges.withColumn("type", F.lit(0))
        nodes = (
            edges.select(F.col("src").alias("key"))
            .union(edges.select(F.col("dst").alias("key")))
            .distinct()
        )
        return cls(spark, nodes=nodes, edges=edges, preload=preload)

    @classmethod
    def with_schema(
        cls,
        spark: SparkSession,
        node_class: type | None = None,
        edge_class: type | None = None,
        **kw: Any,
    ) -> "Graph":
        """Empty graph with schemas declared as dataclasses — the reference's
        ``Graph(node_class=..., edge_class=...)`` constructor pattern
        (graph.py:112-119, README.md:58-90)."""
        from kinbaku_spark.structure import Edge, Node, edge_schema, node_schema

        nodes = spark.createDataFrame([], node_schema(node_class or Node))
        edges = spark.createDataFrame([], edge_schema(edge_class or Edge))
        return cls(spark, nodes=nodes, edges=edges, **kw)

    @classmethod
    def from_kinbaku_file(
        cls,
        spark: SparkSession,
        path: str,
        node_attrs: list | None = None,
        edge_attrs: list | None = None,
        **kw: Any,
    ) -> "Graph":
        """Import a graph from the reference's native binary file format —
        the migration path for existing kinbaku databases (decoder in
        sources/kinbaku_file.py; custom attribute schemas are declared as
        (name, kind) lists mirroring the reference's dataclass fields)."""
        from kinbaku_spark.sources.kinbaku_file import read_kinbaku_file

        nodes, edges = read_kinbaku_file(
            spark, path, node_attrs=node_attrs, edge_attrs=edge_attrs
        )
        return cls(spark, nodes=nodes, edges=edges, **kw)

    def to_kinbaku_file(
        self,
        path: str,
        node_attrs: list | None = None,
        edge_attrs: list | None = None,
        hash_func=None,
        **kw: Any,
    ) -> None:
        """Export this graph INTO the reference's binary file format so the
        reference library can open it directly (pass the same hash_func on
        both sides; defaults to crc32). Collects to the driver by design —
        the target is the reference's single-file model."""
        from kinbaku_spark.sources.kinbaku_file import (
            crc32_hash,
            write_kinbaku_file,
        )

        self._flush()
        attr_names = [n for n, _ in (node_attrs or [])]
        node_rows = [
            (r["key"], {a: r[a] for a in attr_names})
            for r in self._nodes.select("key", *attr_names)
            .orderBy("key")
            .collect()
        ]
        eattr_names = [n for n, _ in (edge_attrs or [])]
        edge_rows = [
            (r["src"], r["dst"], r["type"], {a: r[a] for a in eattr_names})
            for r in self._edges.select("src", "dst", "type", *eattr_names)
            .orderBy("src", "dst", "type")
            .collect()
        ]
        write_kinbaku_file(
            path,
            node_rows,
            edge_rows,
            node_attrs=node_attrs,
            edge_attrs=edge_attrs,
            hash_func=hash_func or crc32_hash,
            **kw,
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str, **kw: Any) -> "Graph":
        nodes = spark.read.parquet(f"{path}/nodes")
        edges = spark.read.parquet(f"{path}/edges")
        return cls(spark, nodes=nodes, edges=edges, **kw)

    def save(self, path: str, partition_edges_by_src: bool = True) -> None:
        """Persist as Parquet. Edges are written bucketed-by-src ordering so a
        reload colocates each node's out-edges (the moral equivalent of the
        reference's per-node out-edge tree, graph.py:472-492)."""
        self._flush()
        self._nodes.write.mode("overwrite").parquet(f"{path}/nodes")
        ew = self._edges.sortWithinPartitions("src") if partition_edges_by_src else self._edges
        ew.write.mode("overwrite").parquet(f"{path}/edges")

    def compact(self, path: str, target_partitions: int | None = None) -> "Graph":
        """Rewrite storage into few, sorted files — the immutable-storage
        analog of the reference's tombstone reclamation (graph.py:390-407,
        recycled slots) and of Delta OPTIMIZE. Mutation-heavy facades
        accumulate small files / long lineage; compaction range-partitions
        nodes by key and edges by (src, dst) and sorts within partitions,
        so reloads get tight min/max stats (point lookups prune to one
        file) and co-located per-node edge runs. Returns the compacted,
        reloaded Graph.
        """
        self._flush()
        n = target_partitions or max(1, self._nodes.rdd.getNumPartitions() // 8)
        nodes = (
            self._nodes.repartitionByRange(n, "key").sortWithinPartitions("key")
        )
        edges = (
            self._edges.repartitionByRange(n, "src", "dst")
            .sortWithinPartitions("src", "dst", "type")
        )
        nodes.write.mode("overwrite").parquet(f"{path}/nodes")
        edges.write.mode("overwrite").parquet(f"{path}/edges")
        return Graph.load(self.spark, path)

    # -- delta machinery -----------------------------------------------------

    def _ensure_index(self) -> None:
        """PRELOAD fast path only (reference preload, graph.py:304-306):
        collect the identity key sets into driver RAM for O(1) existence
        checks. Valid when the key space fits one process — the reference's
        own operating envelope. The DEFAULT path never calls this: point
        mutations use op-log-aware existence probes (_node_exists /
        _edge_exists) and flush-time anti-joins, which stay distributed at
        any graph size."""
        if self._node_keys is None:
            self._node_keys = {r[0] for r in self._nodes.select("key").collect()}
            self._edge_keys = {
                (r[0], r[1], r[2]) for r in self._edges.select(*EDGE_KEY).collect()
            }

    def preload(self) -> None:
        """Load every node and edge record into driver dicts — the
        reference's ``preload=True`` semantics (graph.py:31,59,304-306: all
        node attributes loaded at open, served from the record caches).

        After this, the point reads (``node``/``edge``/``has_node``/
        ``has_edge``) answer from driver memory with NO Spark job — the
        KV-front pattern for the one workload where a distributed scan is
        the wrong shape. Operating envelope: the record set fits one
        process — the reference's own envelope (its entire graph is one
        local file). The DEFAULT path stays fully distributed; bulk
        mutations (add_edges/remove_nodes/...) invalidate the preload, and
        point mutations maintain it eagerly (same discipline as the
        identity key sets)."""
        self._flush()
        self._ensure_index()
        if self._node_rec is None:
            self._node_rec = {r["key"]: r.asDict() for r in self._nodes.collect()}
            self._edge_rec = {
                (r["src"], r["dst"], r["type"]): r.asDict()
                for r in self._edges.collect()
            }
        if self._adj is None:
            adj: dict[str, set] = {}
            pred: dict[str, set] = {}
            for src, dst, _t in self._edge_rec:
                adj.setdefault(src, set()).add(dst)
                pred.setdefault(dst, set()).add(src)
            self._adj, self._pred = adj, pred

    def _blank_node_row(self, key: str) -> dict:
        """The auto-created ('ensure'd) node record: every attr NULL."""
        row = {f.name: None for f in self._nodes.schema}
        row["key"] = key
        return row

    # -- distributed existence probes (no driver-side key sets) --------------

    def _node_exists(self, key: str) -> bool:
        if self._node_keys is not None:
            return key in self._node_keys
        op = self._node_ops.get(key)
        if op is not None:
            return op[0] != "delete"
        return not self._nodes.filter(F.col("key") == key).isEmpty()

    def _edge_exists(self, triple: tuple[str, str, int]) -> bool:
        if self._edge_keys is not None:
            return triple in self._edge_keys
        op = self._edge_ops.get(triple)
        if op is not None:
            return op[0] != "delete"
        src, dst, type_ = triple
        return not self._edges.filter(
            (F.col("src") == src) & (F.col("dst") == dst) & (F.col("type") == type_)
        ).isEmpty()

    def _dirty(self) -> bool:
        return bool(self._node_ops or self._edge_ops)

    def _maybe_flush(self) -> None:
        if len(self._node_ops) + len(self._edge_ops) >= self._flush_every:
            self._flush()

    def _flush(self) -> None:
        """Materialize the delta: one anti-join + union per table."""
        if not self._dirty():
            return
        spark = self.spark
        if self._node_ops:
            # key set changes -> dense key-ordered ids change; the memoized
            # |V| must go with the map or adjacency_coo gates its broadcast
            # on a stale count (ADVICE r03)
            if self._id_map is not None:
                try:
                    self._id_map.unpersist()
                except Exception:
                    pass
                self._id_map = None
            self._id_map_count = None
            upserts = [
                (k, attrs) for k, (op, attrs) in self._node_ops.items() if op == "upsert"
            ]
            ensures = [
                (k, attrs) for k, (op, attrs) in self._node_ops.items() if op == "ensure"
            ]
            # upserts REPLACE the whole record, deletes drop it — both evict
            # the stored row; "ensure" (edge-endpoint auto-create) keeps the
            # stored row and inserts only when absent (anti-join below)
            touched = [k for k, (op, _) in self._node_ops.items() if op != "ensure"]
            schema = _nullable(self._nodes.schema, keep={"key"})
            base = self._nodes
            if touched:
                touched_df = spark.createDataFrame([(k,) for k in touched], "key string")
                base = base.join(F.broadcast(touched_df), on="key", how="left_anti")
            if upserts:
                rows = [self._node_row(k, attrs, schema) for k, attrs in upserts]
                base = base.unionByName(spark.createDataFrame(rows, schema))
            if ensures:
                rows = [self._node_row(k, attrs, schema) for k, attrs in ensures]
                new_nodes = spark.createDataFrame(rows, schema).join(
                    self._nodes.select("key"), on="key", how="left_anti"
                )
                base = base.unionByName(new_nodes)
            self._nodes = base
            self._node_ops = {}
        if self._edge_ops:
            touched = list(self._edge_ops)
            upserts = [
                (t, attrs) for t, (op, attrs) in self._edge_ops.items() if op == "upsert"
            ]
            schema = _nullable(self._edges.schema, keep=set(EDGE_KEY))
            touched_df = spark.createDataFrame(
                touched, "src string, dst string, type int"
            )
            base = self._edges.join(
                F.broadcast(touched_df), on=list(EDGE_KEY), how="left_anti"
            )
            if upserts:
                rows = [self._edge_row(t, attrs, schema) for t, attrs in upserts]
                base = base.unionByName(spark.createDataFrame(rows, schema))
            self._edges = base
            self._edge_ops = {}
        self._flushes += 1
        if self._flushes % CHECKPOINT_EVERY_FLUSHES == 0:
            self._nodes = self._nodes.localCheckpoint(eager=False)
            self._edges = self._edges.localCheckpoint(eager=False)

    @staticmethod
    def _node_row(key: str, attrs: dict | None, schema: StructType) -> Row:
        vals = dict(attrs or {})
        data = {f.name: vals.get(f.name) for f in schema if f.name != "key"}
        data["key"] = key
        return Row(**{f.name: data[f.name] for f in schema})

    @staticmethod
    def _edge_row(triple: tuple, attrs: dict | None, schema: StructType) -> Row:
        vals = dict(attrs or {})
        data = {f.name: vals.get(f.name) for f in schema if f.name not in EDGE_KEY}
        data["src"], data["dst"], data["type"] = triple
        return Row(**{f.name: data[f.name] for f in schema})

    # -- counts (reference header counters, graph.py:133-149) ----------------

    @property
    def n_nodes(self) -> int:
        if self._node_keys is not None and not self._dirty():
            return len(self._node_keys)
        if self._node_keys is not None:
            # counters stay exact under delta because ops are applied eagerly
            # to the identity index
            return len(self._node_keys)
        self._flush()
        return self._nodes.count()

    @property
    def n_edges(self) -> int:
        if self._edge_keys is not None:
            return len(self._edge_keys)
        self._flush()
        return self._edges.count()

    # -- DataFrame accessors --------------------------------------------------

    @property
    def nodes_df(self) -> DataFrame:
        self._flush()
        return self._nodes

    @property
    def edges_df(self) -> DataFrame:
        self._flush()
        return self._edges

    # -- SQL facade (extension; the reference has no SQL surface at all,
    #    SURVEY.md §2.4) ------------------------------------------------------

    def register_views(
        self, nodes_view: str = "g_nodes", edges_view: str = "g_edges"
    ) -> None:
        """Expose the graph as temp views so any ANSI SQL runs against it
        via ``spark.sql`` (Catalyst plans it like the DataFrame API)."""
        self.nodes_df.createOrReplaceTempView(nodes_view)
        self.edges_df.createOrReplaceTempView(edges_view)

    def sql(self, query: str) -> DataFrame:
        """Run SQL against this graph's registered views (sugar: registers
        the default view names first)."""
        self.register_views()
        return self.spark.sql(query)

    def find(self, pattern: str) -> DataFrame:
        """GraphFrames-style motif finding (extension — the reference has
        no multi-hop query surface, SURVEY.md §2.4). The pattern is a
        ';'-separated list of edge terms ``(a)-[]->(b)`` or, with a NAMED
        edge, ``(a)-[e]->(b)``; a leading ``!`` negates a term (the edge
        must NOT exist; negated terms cannot name their edge — there is
        no edge to expose). Vertex names are free identifiers; the result
        has one string column per named vertex PLUS one STRUCT column per
        named edge carrying every edge attribute except the endpoints
        (``type`` and any extra attrs — GraphFrames motif parity), one
        row per binding, duplicates removed. Attribute predicates are
        plain filters on the struct:

            g.find("(a)-[e]->(b); (b)-[]->(c); !(a)-[]->(c)")
             .filter("e.type = 2")

        Compiles to a chain of joins over the edge table (one aliased
        self-join per positive term, a left-anti join per negated term) —
        Catalyst plans/reorders them like any relational query, and a
        struct-field predicate prunes/pushes down to the edge scan like
        any column filter, so the same pattern scales to a cluster-sized
        edge table; every join is keyed on vertex columns (hash-shuffle
        or broadcast as sizes dictate).
        """
        import re as _re

        term_re = _re.compile(
            r"^\s*(!?)\s*\((\w+)\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\((\w+)\)\s*$"
        )
        terms = []
        for raw in pattern.split(";"):
            if not raw.strip():
                continue
            m = term_re.match(raw)
            if m is None:
                raise BadArgument(f"unparseable motif term: {raw!r}")
            terms.append(
                (m.group(1) == "!", m.group(2), m.group(4), m.group(3))
            )
        if not terms or terms[0][0]:
            raise BadArgument("pattern needs a positive first term")

        attr_cols = [c for c in self.edges_df.columns if c not in ("src", "dst")]
        edges = self.edges_df
        vnames = {a for _, a, b, _ in terms} | {b for _, a, b, _ in terms}
        enames = [en for _, _, _, en in terms if en]
        if len(enames) != len(set(enames)):
            raise BadArgument("edge names must be unique across terms")
        clash = set(enames) & vnames
        if clash:
            raise BadArgument(f"edge names clash with vertex names: {clash}")

        result: DataFrame | None = None
        bound: set[str] = set()
        # positive terms first (negation is a filter, not a generator)
        for neg, a, b, ename in sorted(terms, key=lambda t: t[0]):
            if a == b:
                raise BadArgument(f"self-loop term ({a})->({b}) not supported")
            cols = [F.col("src").alias(a), F.col("dst").alias(b)]
            if ename:
                if neg:
                    raise BadArgument(
                        f"negated term cannot name its edge: [{ename}]"
                    )
                cols.append(F.struct(*attr_cols).alias(ename))
            e = edges.select(*cols)
            if result is None:
                result = e
                bound |= {a, b}
                continue
            on = [c for c in (a, b) if c in bound]
            if neg:
                if len(on) != 2:
                    raise BadArgument(
                        f"negated term !({a})->({b}) must use bound vertices"
                    )
                result = result.join(e, on=on, how="left_anti")
            else:
                if not on:
                    raise BadArgument(
                        f"term ({a})->({b}) is disconnected from the pattern"
                    )
                result = result.join(e, on=on)
                bound |= {a, b}
        out_cols = sorted(bound) + sorted(enames)
        return result.select(*out_cols).distinct()

    # -- iteration (reference graph.py:152-171; order is canonicalized to key
    #    order — the reference's DFS/file order is a storage artifact,
    #    FIXTURES.md §5) ------------------------------------------------------

    @property
    def nodes(self) -> Iterator[str]:
        for row in self.nodes_df.select("key").orderBy("key").toLocalIterator():
            yield row[0]

    @property
    def edges(self) -> Iterator[tuple[str, str]]:
        it = self.edges_df.select("src", "dst").orderBy("src", "dst").toLocalIterator()
        for row in it:
            yield (row[0], row[1])

    # -- point reads (reference graph.py:999-1099) ---------------------------

    def node(self, key: str) -> dict:
        if not isinstance(key, str):
            raise BadArgument("node key must be a string")
        op = self._node_ops.get(key)
        ensure_pending = False
        if op is not None:
            kind, attrs = op
            if kind == "delete":
                raise NodeNotFound(key)
            if kind == "upsert":
                # read-your-writes: same shape as a materialized row (absent
                # attrs are NULL — upsert replaces the whole record)
                row = {f.name: (attrs or {}).get(f.name) for f in self._nodes.schema}
                row["key"] = key
                return row
            # "ensure" is insert-if-absent: a stored record keeps its attrs
            # (reference add_edge auto-create never clobbers, graph.py:
            # 1446-1453) — fall through to the stored lookup, and only an
            # absent node reads back as the blank auto-created row
            ensure_pending = True
        if self._node_rec is not None:  # preload: dict-speed point read
            rec = self._node_rec.get(key)
            if rec is not None:
                return dict(rec)
            if ensure_pending:
                return self._blank_node_row(key)
            raise NodeNotFound(key)
        rec = _lru_get(self._node_lru, key)
        if rec is not None:
            return dict(rec)
        rows = self._nodes.filter(F.col("key") == key).limit(1).collect()
        if rows:
            rec = rows[0].asDict()
            _lru_put(self._node_lru, key, dict(rec), self._cache_len)
            return rec
        if ensure_pending:
            return self._blank_node_row(key)
        raise NodeNotFound(key)

    def edge(self, src: str, dst: str, type: int = 0) -> dict:
        triple = (src, dst, type)
        op = self._edge_ops.get(triple)
        if op is not None:
            kind, attrs = op
            if kind == "delete":
                raise EdgeNotFound(triple)
            row = {f.name: (attrs or {}).get(f.name) for f in self._edges.schema}
            row.update({"src": src, "dst": dst, "type": type})
            return row
        if self._edge_rec is not None:  # preload: dict-speed point read
            rec = self._edge_rec.get(triple)
            if rec is None:
                raise EdgeNotFound(triple)
            return dict(rec)
        rec = _lru_get(self._edge_lru, triple)
        if rec is not None:
            return dict(rec)
        rows = (
            self._edges.filter(
                (F.col("src") == src) & (F.col("dst") == dst) & (F.col("type") == type)
            )
            .limit(1)
            .collect()
        )
        if not rows:
            raise EdgeNotFound(triple)
        rec = rows[0].asDict()
        _lru_put(self._edge_lru, triple, dict(rec), self._cache_len)
        return rec

    def has_node(self, key: str) -> bool:
        return self._node_exists(key)

    def has_edge(self, src: str, dst: str, type: int = 0) -> bool:
        return self._edge_exists((src, dst, type))

    # -- traversal (reference graph.py:856-983) -------------------------------

    def neighbors_df(self, key: str) -> DataFrame:
        return (
            self.edges_df.filter(F.col("src") == key)
            .select(F.col("dst").alias("key"))
            .distinct()
        )

    def predecessors_df(self, key: str) -> DataFrame:
        return (
            self.edges_df.filter(F.col("dst") == key)
            .select(F.col("src").alias("key"))
            .distinct()
        )

    def neighbors(self, key: str) -> Iterator[str]:
        if self._adj is not None and not self._dirty():
            yield from sorted(self._adj.get(key, ()))
            return
        for row in self.neighbors_df(key).orderBy("key").toLocalIterator():
            yield row[0]

    def predecessors(self, key: str) -> Iterator[str]:
        if self._pred is not None and not self._dirty():
            yield from sorted(self._pred.get(key, ()))
            return
        for row in self.predecessors_df(key).orderBy("key").toLocalIterator():
            yield row[0]

    def neighbors_from(self, keys: list[str]) -> DataFrame:
        """Batch neighbors: one broadcast join replaces N point lookups
        (reference loops sequentially, graph.py:928-940)."""
        keys_df = self.spark.createDataFrame([(k,) for k in keys], "key string")
        return (
            self.edges_df.join(
                F.broadcast(keys_df), F.col("src") == F.col("key"), "inner"
            )
            .select("key", "dst")
            .distinct()
        )

    def predecessors_from(self, keys: list[str]) -> DataFrame:
        keys_df = self.spark.createDataFrame([(k,) for k in keys], "key string")
        return (
            self.edges_df.join(
                F.broadcast(keys_df), F.col("dst") == F.col("key"), "inner"
            )
            .select("key", "src")
            .distinct()
        )

    def common_neighbors(self, u: str, v: str) -> set[str]:
        df = self.neighbors_df(u).intersect(self.neighbors_df(v))
        return {r[0] for r in df.collect()}

    def common_predecessors(self, u: str, v: str) -> set[str]:
        df = self.predecessors_df(u).intersect(self.predecessors_df(v))
        return {r[0] for r in df.collect()}

    # -- degrees (reference graph.py:985-997; counts EDGES, so parallel types
    #    count separately — matches `SELECT count(*) ... WHERE src=?`) --------

    def out_degree(self, key: str) -> int:
        return self.edges_df.filter(F.col("src") == key).count()

    def in_degree(self, key: str) -> int:
        return self.edges_df.filter(F.col("dst") == key).count()

    def out_degrees(self) -> DataFrame:
        """Bulk degree table — the scale path: one shuffle for every node's
        degree instead of N point queries."""
        return self.edges_df.groupBy(F.col("src").alias("key")).agg(
            F.count(F.lit(1)).alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges_df.groupBy(F.col("dst").alias("key")).agg(
            F.count(F.lit(1)).alias("in_degree")
        )

    # -- pagination (reference graph.py:1101-1186). The reference pages by
    #    file position; we page by key order (keyset pagination — no global
    #    sort, the predicate pushes down to the parquet scan). Cursor None
    #    starts; returned cursor -1 signals the end (parity contract). -------

    def batch_get_nodes(
        self, batch_size: int = 100, cursor: str | None = None
    ) -> tuple[list[dict], Any]:
        df = self.nodes_df
        if cursor is not None and cursor != 0:
            df = df.filter(F.col("key") > cursor)
        rows = df.orderBy("key").limit(batch_size + 1).collect()
        batch = [r.asDict() for r in rows[:batch_size]]
        next_cursor = batch[-1]["key"] if len(rows) > batch_size else -1
        return batch, next_cursor

    def batch_get_edges(
        self, batch_size: int = 100, cursor: tuple | None = None
    ) -> tuple[list[tuple[str, str]], Any]:
        df = self.edges_df
        if cursor is not None and cursor != 0:
            cs, cd, ct = cursor
            df = df.filter(
                (F.col("src") > cs)
                | ((F.col("src") == cs) & (F.col("dst") > cd))
                | ((F.col("src") == cs) & (F.col("dst") == cd) & (F.col("type") > ct))
            )
        rows = df.orderBy("src", "dst", "type").limit(batch_size + 1).collect()
        batch = [(r["src"], r["dst"]) for r in rows[:batch_size]]
        next_cursor = (
            (rows[batch_size - 1]["src"], rows[batch_size - 1]["dst"], rows[batch_size - 1]["type"])
            if len(rows) > batch_size
            else -1
        )
        return batch, next_cursor

    # -- linear algebra export (reference graph.py:1188-1265). Dense ids are
    #    assigned by key order (canonical deviation from first-seen order,
    #    SURVEY.md §4.3b). ----------------------------------------------------

    def node_id_map(self) -> DataFrame:
        from kinbaku_spark.operators.ids import ordered_zero_ids

        # Two-phase range ids (operators/ids.py): same deterministic
        # key-ordered mapping as row_number() OVER (ORDER BY key), without
        # the single-task sort. Materialized once per Graph (the id map is
        # engine state, like the reference's node index) so consumers that
        # reference it repeatedly — adjacency joins use it twice — read one
        # cached table instead of replicating the ranking subplan.
        if self._id_map is None:
            m = ordered_zero_ids(self.nodes_df.select("key").distinct())
            # eager localCheckpoint: materialize once AND truncate lineage,
            # so double references (adjacency joins ids for src and dst)
            # scan the stored map instead of replicating the ranking plan
            self._id_map = m.localCheckpoint(eager=True)
        return self._id_map

    def adjacency_coo(self, weight: str | None = None) -> DataFrame:
        """COO triplets (sid, tid, w) — the distributed form of the
        reference's scipy CSR export. Two joins against the |V|-sized id
        map, broadcast only while |V| is under the size gate
        (plans/hints.py) — past it they fall back to shuffle joins."""
        from kinbaku_spark.plans.hints import maybe_broadcast

        ids_df = self.node_id_map()
        if self._id_map_count is None:
            # one cheap count over the materialized (localCheckpointed) map,
            # memoized per Graph — NOT self.n_nodes, which would add a
            # full nodes-table scan job to every adjacency export
            self._id_map_count = ids_df.count()
        ids = maybe_broadcast(ids_df, self._id_map_count)
        e = self.edges_df
        w = F.col(weight) if weight else F.lit(1.0)
        return (
            e.select("src", "dst", w.alias("w"))
            .join(ids.withColumnRenamed("key", "src").withColumnRenamed("id", "sid"), "src")
            .join(ids.withColumnRenamed("key", "dst").withColumnRenamed("id", "tid"), "dst")
            .select("sid", "tid", "w")
        )

    def adjacency_matrix(self, weight: str | None = None):
        """Driver-side sparse matrix + key->id dict, parity with the reference
        return shape. Falls back to a dict-of-arrays when scipy is absent."""
        ids = {r["key"]: r["id"] for r in self.node_id_map().collect()}
        coo = self.adjacency_coo(weight).collect()
        n = len(ids)
        rows = [r["sid"] for r in coo]
        cols = [r["tid"] for r in coo]
        vals = [r["w"] for r in coo]
        try:
            from scipy.sparse import csr_matrix

            return csr_matrix((vals, (rows, cols)), shape=(n, n)), ids
        except ImportError:
            return {"shape": (n, n), "rows": rows, "cols": cols, "vals": vals}, ids

    def subgraph(self, keys: list[str], weight: str | None = None):
        """Induced-subgraph sparse matrix + key->id dict — reference return
        shape (graph.py:1231-1265); dict-of-arrays fallback without scipy."""
        ids = {k: i for i, k in enumerate(sorted(set(keys)))}
        coo = self.subgraph_coo(keys, weight).collect()
        n = len(ids)
        rows = [r["sid"] for r in coo]
        cols = [r["tid"] for r in coo]
        vals = [r["w"] for r in coo]
        try:
            from scipy.sparse import csr_matrix

            return csr_matrix((vals, (rows, cols)), shape=(n, n)), ids
        except ImportError:
            return {"shape": (n, n), "rows": rows, "cols": cols, "vals": vals}, ids

    def subgraph_coo(self, keys: list[str], weight: str | None = None) -> DataFrame:
        """Induced subgraph as COO (reference graph.py:1231-1265): double
        broadcast semi-join on the key list, then dense ids over the list."""
        spark = self.spark
        # the key list is caller-supplied (already on the driver): enumerate
        # it in Python rather than planning a window over a 1-row-per-key
        # single partition — same ids, no WindowExec in the plan
        ids = F.broadcast(
            spark.createDataFrame(
                [(k, i) for i, k in enumerate(sorted(set(keys)))],
                "key string, id long",
            )
        )
        e = self.edges_df
        wcol = F.col(weight) if weight else F.lit(1.0)
        return (
            e.select("src", "dst", wcol.alias("w"))
            .join(ids.withColumnRenamed("key", "src").withColumnRenamed("id", "sid"), "src")
            .join(ids.withColumnRenamed("key", "dst").withColumnRenamed("id", "tid"), "dst")
            .select("sid", "tid", "w")
        )

    # -- point mutations (reference graph.py:1353-1563). Upsert REPLACES the
    #    whole attribute record (graph.py:1385-1405 — "attention" note in the
    #    reference docs: writes never merge). ---------------------------------

    def add_node(self, key: str, attr: dict | None = None) -> dict:
        if not isinstance(key, str):
            raise BadArgument("node key must be a string")
        self._node_ops[key] = ("upsert", dict(attr or {}))
        if self._node_keys is not None:
            self._node_keys.add(key)
        self._node_lru.pop(key, None)
        if self._node_rec is not None:  # upsert replaces the whole record
            row = {f.name: (attr or {}).get(f.name) for f in self._nodes.schema}
            row["key"] = key
            self._node_rec[key] = row
        self._maybe_flush()
        return {"key": key, **(attr or {})}

    def add_edge(
        self, src: str, dst: str, attr: dict | None = None, type: int = 0
    ) -> dict:
        # auto-create missing endpoints (graph.py:1446-1453); existing nodes
        # keep their attributes. "ensure" ops insert-if-absent at flush time
        # (anti-join against the stored table), so no existence check — and
        # no driver-side key set — is needed here. A pending upsert/delete
        # for the same key wins (setdefault), preserving op order.
        for k in (src, dst):
            self._node_ops.setdefault(k, ("ensure", {}))
            if self._node_keys is not None:
                self._node_keys.add(k)
            if self._node_rec is not None:  # insert-if-absent, attrs kept
                self._node_rec.setdefault(k, self._blank_node_row(k))
        self._edge_ops[(src, dst, type)] = ("upsert", dict(attr or {}))
        self._invalidate_adjacency()
        if self._edge_keys is not None:
            self._edge_keys.add((src, dst, type))
        self._edge_lru.pop((src, dst, type), None)
        if self._edge_rec is not None:
            row = {f.name: (attr or {}).get(f.name) for f in self._edges.schema}
            row.update({"src": src, "dst": dst, "type": type})
            self._edge_rec[(src, dst, type)] = row
        self._maybe_flush()
        return {"src": src, "dst": dst, "type": type, **(attr or {})}

    def remove_edge(self, src: str, dst: str, type: int = 0) -> None:
        triple = (src, dst, type)
        if not self._edge_exists(triple):
            raise EdgeNotFound(triple)
        self._edge_ops[triple] = ("delete", None)
        self._invalidate_adjacency()
        if self._edge_keys is not None:
            self._edge_keys.discard(triple)
        self._edge_lru.pop(triple, None)
        if self._edge_rec is not None:
            self._edge_rec.pop(triple, None)
        self._maybe_flush()

    def remove_node(self, key: str) -> None:
        """Remove a node and ALL incident edges (graph.py:1543-1563).

        The cascade is DISTRIBUTED: pending ops flush first (preserving op
        order), then incident edges drop via a lazy filter on the edge
        table — no enumeration of incident edges on the driver, so the op
        works at any degree. Preload key sets, when loaded, are maintained
        for O(1) existence reuse."""
        if not self._node_exists(key):
            raise NodeNotFound(key)
        self._invalidate_adjacency()
        self._flush()
        self._edges = self._edges.filter(
            (F.col("src") != key) & (F.col("dst") != key)
        )
        self._nodes = self._nodes.filter(F.col("key") != key)
        if self._edge_keys is not None:
            self._edge_keys = {
                t for t in self._edge_keys if t[0] != key and t[1] != key
            }
        if self._node_keys is not None:
            self._node_keys.discard(key)
        self._node_lru.pop(key, None)
        if self._node_rec is not None:
            self._node_rec.pop(key, None)
        # cascade: drop every incident edge record (same rule as the key set)
        for lru_or_rec in (self._edge_lru, self._edge_rec):
            if lru_or_rec is not None:
                for t in [t for t in lru_or_rec if t[0] == key or t[1] == key]:
                    del lru_or_rec[t]
        self._flushes += 1
        if self._flushes % CHECKPOINT_EVERY_FLUSHES == 0:
            self._nodes = self._nodes.localCheckpoint(eager=False)
            self._edges = self._edges.localCheckpoint(eager=False)

    def _set_adjacent(
        self, key: str, others: list[str], type: int, direction: str
    ) -> None:
        """Shared set_neighbors/set_predecessors core (graph.py:886-905):
        make the out- (in-) neighbor set of ``key`` exactly ``others``.
        Existing edges to surviving targets keep their attributes; removed
        targets drop; new targets are created empty, endpoints auto-created
        — all as lazy DataFrame algebra (filter + anti-join + union), no
        driver-side enumeration of the current adjacency."""
        self._invalidate_adjacency()
        self._flush()
        this_col, other_col = ("src", "dst") if direction == "out" else ("dst", "src")
        target = sorted(set(others))
        spark = self.spark
        # nodes: ensure key + all targets exist (insert-if-absent)
        for k in [key] + target:
            self._node_ops.setdefault(k, ("ensure", {}))
            if self._node_keys is not None:
                self._node_keys.add(k)
        # edges: drop (key, v) of this type where v no longer targeted
        mine = (F.col(this_col) == key) & (F.col("type") == type)
        survives = F.col(other_col).isin(target) if target else F.lit(False)
        kept = self._edges.filter(~mine | survives)
        # add rows for targets not already present (attrs NULL), same as the
        # reference's add-side of the set diff
        tgt_df = spark.createDataFrame([(v,) for v in target], f"{other_col} string")
        missing = tgt_df.join(
            self._edges.filter(mine).select(other_col), other_col, "left_anti"
        )
        schema = _nullable(self._edges.schema, keep=set(EDGE_KEY))
        new_rows = missing.select(
            *[
                F.lit(key).alias(f.name)
                if f.name == this_col
                else F.col(other_col)
                if f.name == other_col
                else F.lit(type).cast("int").alias("type")
                if f.name == "type"
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema
            ]
        )
        self._edges = kept.unionByName(new_rows)
        if self._edge_keys is not None:
            tgt = set(target)
            if direction == "out":
                self._edge_keys = {
                    t
                    for t in self._edge_keys
                    if not (t[0] == key and t[2] == type and t[1] not in tgt)
                } | {(key, v, type) for v in tgt}
            else:
                self._edge_keys = {
                    t
                    for t in self._edge_keys
                    if not (t[1] == key and t[2] == type and t[0] not in tgt)
                } | {(v, key, type) for v in tgt}
        # record caches: the set-diff is driver-enumerable only for the LRU
        # and preload dicts we hold — surviving records keep their attrs,
        # removed ones drop, new ones appear blank (matching the DataFrame
        # algebra above); pending "ensure" node keys appear blank-if-absent
        tgt = set(target)
        if self._node_rec is not None:
            for k in [key] + target:
                self._node_rec.setdefault(k, self._blank_node_row(k))
        for cache in (self._edge_lru, self._edge_rec):
            if cache is None:
                continue
            mine_idx, other_idx = (0, 1) if direction == "out" else (1, 0)
            for t in [
                t
                for t in cache
                if t[mine_idx] == key and t[2] == type and t[other_idx] not in tgt
            ]:
                del cache[t]
        if self._edge_rec is not None:
            for v in tgt:
                t = (key, v, type) if direction == "out" else (v, key, type)
                if t not in self._edge_rec:
                    row = {f.name: None for f in self._edges.schema}
                    row.update({"src": t[0], "dst": t[1], "type": type})
                    self._edge_rec[t] = row
        self._flushes += 1
        if self._flushes % CHECKPOINT_EVERY_FLUSHES == 0:
            self._nodes = self._nodes.localCheckpoint(eager=False)
            self._edges = self._edges.localCheckpoint(eager=False)

    def set_neighbors(self, key: str, neighbors: list[str], type: int = 0) -> None:
        """Make the out-neighbor set exactly ``neighbors`` (graph.py:886-905)."""
        self._set_adjacent(key, neighbors, type, "out")

    def set_predecessors(self, key: str, predecessors: list[str], type: int = 0) -> None:
        self._set_adjacent(key, predecessors, type, "in")

    # -- batch mutations (the scale path; no driver-side index needed) --------

    def add_edges(self, new_edges: DataFrame) -> None:
        """Bulk upsert on (src,dst,type): anti-join + union, endpoints
        auto-created. One shuffle; Delta-MERGE-shaped."""
        self._flush()
        self._invalidate_index()
        if "type" not in new_edges.columns:
            new_edges = new_edges.withColumn("type", F.lit(0).cast("int"))
        for c in self._edges.columns:
            if c not in new_edges.columns:
                new_edges = new_edges.withColumn(c, F.lit(None).cast(self._edges.schema[c].dataType))
        new_edges = new_edges.select(self._edges.columns).dropDuplicates(list(EDGE_KEY))
        self._edges = self._edges.join(
            new_edges.select(*EDGE_KEY), on=list(EDGE_KEY), how="left_anti"
        ).unionByName(new_edges)
        endpoints = (
            new_edges.select(F.col("src").alias("key"))
            .union(new_edges.select("dst"))
            .distinct()
        )
        missing = endpoints.join(self._nodes.select("key"), "key", "left_anti")
        for c in self._nodes.columns:
            if c != "key":
                missing = missing.withColumn(c, F.lit(None).cast(self._nodes.schema[c].dataType))
        self._nodes = self._nodes.unionByName(missing.select(self._nodes.columns))

    def remove_edges(self, triples: DataFrame) -> None:
        self._flush()
        self._invalidate_index()
        if "type" not in triples.columns:
            triples = triples.withColumn("type", F.lit(0).cast("int"))
        self._edges = self._edges.join(
            triples.select(*EDGE_KEY), on=list(EDGE_KEY), how="left_anti"
        )

    def add_nodes(self, new_nodes: DataFrame) -> None:
        self._flush()
        self._invalidate_index()
        for c in self._nodes.columns:
            if c not in new_nodes.columns:
                new_nodes = new_nodes.withColumn(c, F.lit(None).cast(self._nodes.schema[c].dataType))
        new_nodes = new_nodes.select(self._nodes.columns).dropDuplicates(["key"])
        self._nodes = self._nodes.join(
            new_nodes.select("key"), on="key", how="left_anti"
        ).unionByName(new_nodes)

    def remove_nodes(self, keys: DataFrame, cascade: bool = True) -> None:
        """Bulk node removal; cascade drops incident edges (two anti-joins
        replace the reference's 250-line BST unlink, SURVEY.md §3.4)."""
        self._flush()
        self._invalidate_index()
        k = keys.select("key")
        self._nodes = self._nodes.join(k, "key", "left_anti")
        if cascade:
            self._edges = self._edges.join(
                k.withColumnRenamed("key", "src"), "src", "left_anti"
            ).join(k.withColumnRenamed("key", "dst"), "dst", "left_anti").select(
                *[c for c in self._edges.columns]
            )

    def _invalidate_adjacency(self) -> None:
        self._adj = None
        self._pred = None

    def _invalidate_index(self) -> None:
        self._node_keys = None
        self._edge_keys = None
        self._node_rec = None
        self._edge_rec = None
        self._node_lru.clear()
        self._edge_lru.clear()
        self._invalidate_adjacency()
        if self._id_map is not None:
            try:
                self._id_map.unpersist()
            except Exception:
                pass
            self._id_map = None
        self._id_map_count = None

    # -- lifecycle / maintenance parity (reference graph.py:383-407, 852) -----

    def empty_cache(self) -> None:
        """Drop cached/persisted state (reference empty_cache drops its four
        LRU caches, graph.py:383-388)."""
        self._invalidate_index()
        for df in (self._nodes, self._edges):
            try:
                df.unpersist()
            except Exception:
                pass

    def find_tombstones(self) -> list:
        """Reference rebuilds its free-list by scanning for blanked records
        (graph.py:390-407). Immutable storage has no tombstones: deletes are
        anti-joins that produce new files. Returns [] for API parity;
        storage reclamation is the writer's compaction (rewrite/OPTIMIZE)."""
        return []

    def close(self) -> None:
        """Release resources (reference unmaps the file, graph.py:852-854).
        The SparkSession is shared and NOT stopped here."""
        self._flush()
        self.empty_cache()

    # -- graph algorithms (extension surface; the reference has none) ---------

    def connected_components(self, max_iter: int = 64) -> DataFrame:
        """Weakly-connected components: (key, component) with component =
        min key in the component (lexicographic). Min-label propagation with
        pointer-doubling shortcutting, run to FIXPOINT in O(log diameter)
        rounds (operators/cc_kernel.py — the shared kernel with
        duplicate_clusters and the streaming CC). ``max_iter`` is a runaway
        guard: exhausting it raises CCConvergenceError rather than silently
        returning unconverged labels."""
        from kinbaku_spark.operators.cc_kernel import min_label_fixpoint

        und = (
            self.edges_df.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .union(self.edges_df.select(F.col("dst"), F.col("src")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = self.nodes_df.select(F.col("key").alias("u"), F.col("key").alias("label"))
        labels = min_label_fixpoint(labels, und, max_rounds=max_iter)
        return labels.select(F.col("u").alias("key"), F.col("label").alias("component"))

    def scc_bounded(self, prop_rounds: int = 3, peels: int = 2) -> DataFrame:
        """Strongly connected components via bounded FW-BW min-label
        peeling (operators/components.py): (key, comp, peel) — certified
        groups are provably inside one true SCC; to-convergence budgets
        (prop_rounds, peels ≥ |V|) yield the exact partition. The
        reference has no component queries at all (SURVEY.md §2.4)."""
        from kinbaku_spark.operators.components import scc_bounded

        return scc_bounded(self.edges_df, prop_rounds=prop_rounds, peels=peels)

    def scc(
        self,
        max_iters: int = 30,
        max_rounds: int = 256,
        local_threshold: int = 100_000,
    ) -> DataFrame:
        """Strongly connected components TO CONVERGENCE (key, comp) — comp
        is the min key of the node's true SCC, including isolated nodes
        (comp = own key). Multi-pivot FW-BW with hashed labels and
        argmin-label shortcutting plus the Multistep serial tail
        (operators/components.scc); budgets exhaust into
        SCCConvergenceError, never silently-bounded labels — the directed
        twin of connected_components' convergence contract. scc_bounded
        remains the fixed-budget form (sound per-group containment)."""
        from kinbaku_spark.operators.components import scc

        labelled = scc(
            self.edges_df,
            max_iters=max_iters,
            max_rounds=max_rounds,
            local_threshold=local_threshold,
        )
        isolated = (
            self.nodes_df.select("key")
            .join(labelled.select("key"), "key", "left_anti")
            .select("key", F.col("key").alias("comp"))
        )
        return labelled.unionByName(isolated)

    def katz_centrality(self, rounds: int = 3, scale: int = 8) -> DataFrame:
        """Katz centrality (α = 1/scale, β = 1) over the symmetrized edge
        set, integer-exact bounded power iteration
        (operators/components.py): (key, katz_scaled, katz)."""
        from kinbaku_spark.operators.components import katz_scores

        return katz_scores(self.edges_df, rounds=rounds, scale=scale)

    def eigenvector_walks(self, rounds: int = 3) -> DataFrame:
        """Exact length-``rounds`` walk counts (un-normalized eigenvector
        power iteration) over the symmetrized edge set: (key, walks)."""
        from kinbaku_spark.operators.components import walk_counts

        return walk_counts(self.edges_df, rounds=rounds)

    def densest_subgraph(self, peel_rounds: int = 5) -> DataFrame:
        """Charikar ε-peel density trace over the edge set: (round,
        n_nodes, n_edges, density_ppm) — the max row 2(1+ε)-approximates
        the densest subgraph."""
        from kinbaku_spark.operators.components import densest_subgraph_trace

        return densest_subgraph_trace(self.edges_df, peel_rounds=peel_rounds)

    # -- dunder sugar (reference graph.py:1271-1306, 1565-1577) ---------------

    def __getitem__(self, item):
        if isinstance(item, str):
            return self.node(item)
        if isinstance(item, tuple) and len(item) in (2, 3):
            return self.edge(*item)
        raise BadArgument(f"bad graph subscript: {item!r}")

    def __setitem__(self, item, attr):
        if isinstance(item, str):
            self.add_node(item, attr)
        elif isinstance(item, tuple) and len(item) in (2, 3):
            if len(item) == 2:
                self.add_edge(item[0], item[1], attr)
            else:
                self.add_edge(item[0], item[1], attr, type=item[2])
        else:
            raise BadArgument(f"bad graph subscript: {item!r}")

    def __contains__(self, item) -> bool:
        if isinstance(item, str):
            return self.has_node(item)
        if isinstance(item, tuple) and len(item) in (2, 3):
            return self.has_edge(*item)
        raise BadArgument(f"bad membership probe: {item!r}")

    def __repr__(self) -> str:
        return f"Graph(n_nodes={self.n_nodes}, n_edges={self.n_edges})"
