"""Replay the reference's implied workloads (BASELINE.md: the example
scripts it ships with no timings) at the same sizes, on this engine.

- edge_removal.py shape: 5,000,000 random edges over 10,000 nodes —
  bulk build, then remove ALL edges in 50 random batches of 100k.
- one_node_many_neighbors.py shape: a single hub with 200,000
  out-neighbors; one neighbors() scan.
- adjacency_matrix.py shape: COO export + 100-node induced subgraph over
  a 2,000,000-edge graph.

Edges are generated deterministically (xxhash64 of a sequence id), fully
distributed — no driver-side edge lists. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinbaku_spark.graph import Graph
from kinbaku_spark.session import get_spark


def random_edges(spark, n_edges: int, n_nodes: int, seed: int):
    """Deterministic pseudo-random edge list, generated executor-side."""
    ids = spark.range(n_edges).repartition(32)
    h1 = F.xxhash64(F.col("id"), F.lit(seed))
    h2 = F.xxhash64(F.col("id"), F.lit(seed + 1))
    return ids.select(
        F.concat(F.lit("n"), F.pmod(h1, F.lit(n_nodes))).alias("src"),
        F.concat(F.lit("n"), F.pmod(h2, F.lit(n_nodes))).alias("dst"),
        F.lit(0).alias("type"),
    ).dropDuplicates(["src", "dst", "type"])


def main() -> None:
    spark = get_spark(app_name="stress_reference_workloads")
    out: dict[str, float | int] = {}

    # -- 5M-edge build + full removal (edge_removal.py) -----------------------
    t0 = time.perf_counter()
    edges = random_edges(spark, 5_000_000, 10_000, seed=11).persist()
    g = Graph.from_edges(edges)
    n_edges = g.n_edges
    out["build_5m_edges_sec"] = round(time.perf_counter() - t0, 2)
    out["build_5m_edges_rows"] = n_edges

    t0 = time.perf_counter()
    batched = edges.withColumn(
        "batch", F.pmod(F.xxhash64("src", "dst", F.lit(99)), F.lit(50))
    ).persist()
    batched.count()
    for b in range(50):
        g.remove_edges(
            batched.filter(F.col("batch") == b).select("src", "dst", "type")
        )
        if b % 10 == 9:  # bound lineage like any long mutation stream
            g._edges = g._edges.localCheckpoint(eager=True)
    remaining = g.n_edges
    out["remove_5m_in_50_batches_sec"] = round(time.perf_counter() - t0, 2)
    out["edges_after_removal"] = remaining
    assert remaining == 0, remaining
    batched.unpersist()
    edges.unpersist()

    # -- 200k-out-degree hub (one_node_many_neighbors.py) ---------------------
    t0 = time.perf_counter()
    hub = spark.range(200_000).select(
        F.lit("hub").alias("src"),
        F.concat(F.lit("m"), F.col("id")).alias("dst"),
        F.lit(0).alias("type"),
    )
    gh = Graph.from_edges(hub)
    deg = gh.out_degree("hub")
    out["hub_build_200k_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n = gh.neighbors_df("hub").count()
    out["hub_neighbors_scan_sec"] = round(time.perf_counter() - t0, 2)
    assert deg == n == 200_000, (deg, n)

    # -- adjacency over 2M edges (adjacency_matrix.py) ------------------------
    g2 = Graph.from_edges(random_edges(spark, 2_000_000, 50_000, seed=7))
    t0 = time.perf_counter()
    coo = g2.adjacency_coo()
    nnz = coo.count()
    out["adjacency_2m_coo_sec"] = round(time.perf_counter() - t0, 2)
    out["adjacency_2m_nnz"] = nnz
    t0 = time.perf_counter()
    sub_keys = [f"n{i}" for i in range(100)]
    sub_nnz = g2.subgraph_coo(sub_keys).count()
    out["subgraph_100_nodes_sec"] = round(time.perf_counter() - t0, 2)
    out["subgraph_100_nnz"] = sub_nnz

    print(json.dumps(out))


if __name__ == "__main__":
    main()
