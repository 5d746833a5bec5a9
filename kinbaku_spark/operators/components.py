"""Reusable bounded graph-analytics operators over plain edge DataFrames:
FW-BW min-label strongly connected components, integer-exact Katz power
iteration, walk-count eigenvector estimates, and Charikar densest-subgraph
peeling. The registry queries (queries/graphmetrics_ext4.py) and the Graph
facade methods both delegate here, so the algorithms are library API —
callable on ANY (src, dst) edge table — not query-file one-offs.

The reference (kerighan/kinbaku) has no analytics surface (SURVEY.md §2.4);
this extends the engine the way NetworkX extends a dict-of-dicts.

All determinism/scale contracts are documented on the query module
(graphmetrics_ext4.py): integer-exact arithmetic throughout, MIN-label
order-freedom, per-round size-gated broadcasts, fixed round budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kinbaku_spark.plans.hints import size_hint


def _gate(edges: DataFrame, bound_rows: int | None):
    """Size gate for node-sized vectors: callers pass a known |V| bound;
    a library caller without one pays one count of the endpoint set."""
    if bound_rows is None:
        bound_rows = (
            edges.select(F.col("src").alias("k"))
            .union(edges.select("dst"))
            .distinct()
            .count()
        )
    return size_hint(bound_rows)


def scc_bounded(
    edges: DataFrame,
    prop_rounds: int = 3,
    peels: int = 2,
    bound_rows: int | None = None,
) -> DataFrame:
    """Bounded FW-BW min-label SCC over a directed (src, dst) edge table:
    returns (key, comp, peel) for every endpoint — peel = the 1-based peel
    that certified the node, NULL for pending (comp = own key, no claim).

    Soundness (any budget): a certified group {v : f(v)=b(v)=m} is inside
    the true SCC of m. Completeness (to convergence): with prop_rounds and
    peels ≥ |V| the output is exactly the SCC partition — each peel
    certifies at least the whole SCC of the residual graph's min key
    (property-tested vs NetworkX, tests/test_property_components.py).
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    hint = _gate(edges, bound_rows)
    active = (
        edges.select(F.col("src").alias("key"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e_act = edges
    certified = []
    for peel in range(1, peels + 1):
        # one (key, f, b) state vector — both directions propagate per
        # round through one unioned contribution stream: ONE aggregation,
        # one merge join, one checkpoint (the plan fusion; the f/b
        # recurrences are the textbook ones the SQL oracles replay)
        lab = active.select("key", F.col("key").alias("f"), F.col("key").alias("b"))
        for _ in range(prop_rounds):
            fwd = e_act.join(
                hint(lab.select(F.col("key").alias("w"), F.col("f").alias("fw"))),
                e_act.dst == F.col("w"),
            ).select(
                F.col("src").alias("node"),
                "fw",
                F.lit(None).cast("string").alias("bw"),
            )
            bwd = e_act.join(
                hint(lab.select(F.col("key").alias("u"), F.col("b").alias("bu"))),
                e_act.src == F.col("u"),
            ).select(
                F.col("dst").alias("node"),
                F.lit(None).cast("string").alias("fw"),
                F.col("bu").alias("bw"),
            )
            contrib = (
                fwd.unionByName(bwd)
                .groupBy("node")
                .agg(F.min("fw").alias("nf"), F.min("bw").alias("nb"))
            )
            lab = (
                lab.join(hint(contrib.withColumnRenamed("node", "key")), "key", "left")
                .select(
                    "key",
                    F.least(F.col("f"), F.coalesce("nf", F.col("f"))).alias("f"),
                    F.least(F.col("b"), F.coalesce("nb", F.col("b"))).alias("b"),
                )
                .localCheckpoint(eager=False)
            )
        certified.append(
            lab.filter(F.col("f") == F.col("b")).select(
                "key",
                F.col("f").alias("comp"),
                F.lit(peel).cast("int").alias("peel"),
            )
        )
        active = lab.filter(F.col("f") != F.col("b")).select("key")
        e_act = (
            e_act.join(hint(active.withColumnRenamed("key", "src")), "src", "semi")
            .join(hint(active.withColumnRenamed("key", "dst")), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    pending = active.select(
        "key", F.col("key").alias("comp"), F.lit(None).cast("int").alias("peel")
    )
    out = certified[0]
    for c in certified[1:]:
        out = out.unionByName(c)
    return out.unionByName(pending)


def _symmetrized(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst"), F.col("src"))
    )


def _node_keys(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("key")).union(edges.select("dst")).distinct()
    )


def katz_scores(
    edges: DataFrame,
    rounds: int = 3,
    scale: int = 8,
    nodes: DataFrame | None = None,
    bound_rows: int | None = None,
) -> DataFrame:
    """Katz centrality (α = 1/scale, β = 1) on the symmetrized edge table,
    integer-exact: returns (key, katz_scaled BIGINT, katz double) with
    katz_scaled = scale^rounds · katz exactly (graphmetrics_ext4 contract).
    """
    und = _symmetrized(edges)
    nodes = (nodes or _node_keys(edges)).select("key")
    hint = _gate(edges, bound_rows)
    s = nodes.select("key", F.lit(1).cast("long").alias("s"))
    for t in range(1, rounds + 1):
        neigh = (
            und.join(hint(s.select(F.col("key").alias("u2"), "s")), und.u == F.col("u2"))
            .groupBy("v")
            .agg(F.sum("s").alias("ns"))
        )
        s = (
            nodes.join(hint(neigh.withColumnRenamed("v", "key")), "key", "left")
            .select(
                "key",
                (F.lit(scale**t) + F.coalesce(F.col("ns"), F.lit(0)))
                .cast("long")
                .alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return s.select(
        "key",
        F.col("s").alias("katz_scaled"),
        (F.col("s") / F.lit(float(scale**rounds))).alias("katz"),
    )


def walk_counts(
    edges: DataFrame,
    rounds: int = 3,
    nodes: DataFrame | None = None,
    bound_rows: int | None = None,
) -> DataFrame:
    """Exact length-``rounds`` walk counts on the symmetrized edge table
    (w = A^T·1): (key, walks BIGINT) — the un-normalized eigenvector-
    centrality power iteration (graphmetrics_ext4 contract)."""
    und = _symmetrized(edges)
    nodes = (nodes or _node_keys(edges)).select("key")
    hint = _gate(edges, bound_rows)
    w = nodes.select("key", F.lit(1).cast("long").alias("w"))
    for _ in range(rounds):
        neigh = (
            und.join(hint(w.select(F.col("key").alias("u2"), "w")), und.u == F.col("u2"))
            .groupBy("v")
            .agg(F.sum("w").alias("nw"))
        )
        w = (
            nodes.join(hint(neigh.withColumnRenamed("v", "key")), "key", "left")
            .select("key", F.coalesce(F.col("nw"), F.lit(0)).cast("long").alias("w"))
            .localCheckpoint(eager=False)
        )
    return w.select("key", F.col("w").alias("walks"))


def densest_subgraph_trace(
    edges: DataFrame,
    peel_rounds: int = 5,
    bound_rows: int | None = None,
) -> DataFrame:
    """Charikar ε-peel (ε = 0.1) density trace over a (src, dst) edge set
    treated as undirected simple edges: PEEL fixed rounds of (round,
    n_nodes, n_edges, density_ppm), low-degree nodes removed per round
    (graphmetrics_ext4 contract — the max row 2(1+ε)-approximates the
    densest subgraph)."""
    hint = _gate(edges, bound_rows)
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rows = []
    for r in range(peel_rounds):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select("b"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=False)
        )
        stats = deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.expr("sum(d) div 2"), F.lit(0)).cast("long").alias("n_edges"),
        )
        rows.append(
            stats.select(
                F.lit(r).cast("int").alias("round"),
                "n_nodes",
                "n_edges",
                F.expr(
                    "CASE WHEN n_nodes = 0 THEN NULL"
                    " ELSE n_edges * 1000000 div n_nodes END"
                ).alias("density_ppm"),
            )
        )
        keep = (
            deg.join(F.broadcast(stats))
            .filter(F.col("d") * F.col("n_nodes") * 10 > 22 * F.col("n_edges"))
            .select("v")
        )
        e = (
            e.join(hint(keep.withColumnRenamed("v", "a")), "a", "semi")
            .join(hint(keep.withColumnRenamed("v", "b")), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
