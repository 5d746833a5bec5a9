"""Partition-count invariance: re-running a hash/aggregation-heavy query
with a different spark.sql.shuffle.partitions must produce IDENTICAL
rows — the failure class where per-partition float accumulation order or
partition-id-dependent logic leaks into results (the round-2 ids bug).

Session-persisted engine state (co_shared, cluster labels, geo_fwd,
the shingle/signature index, the PQ-scored corpus) would mask the
re-partitioned run, so the resettable caches are DROPPED between the
reference and alternate runs (graph-module state queries stay excluded —
their cache lives with the persisted graph itself). The picks cover the
sensitive arithmetic paths: decimal sums, minhash aggregation,
exact-integer Gram partial aggs, k-means centroid sums, hash-argmin
walks, window ranking.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("KB_FULL_PARITY") != "1",
    reason=(
        "heavy receipt tier (r08, VERDICT r07 next-round #1b): runs with"
        " KB_FULL_PARITY=1 alongside the 286-query parity replica so the"
        " default suite finishes inside the driver's verify window;"
        " receipted per round in OPTIMIZATION_rNN.md"
    ),
)

import math
from datetime import datetime

import pytest

from kinbaku_spark.queries import QUERIES

PICKS = [
    "q1_pricing_summary",
    "x_dsir_weights",
    "x_dedup_minhash",
    "x_group_quantiles",
    "x_pca_top_component",
    "x_kmeans_clusters",
    "g_node2vec_walks",
    "q_window_top_orders",
    "x_ann_pq_adc",
    "g_boruvka_mst",
    "x_bootstrap_ci",
    "x_coreset_kcenter",
    "x_dedup_edit_distance",
    "x_image_decode_real",
    "x_audio_decode_real",
    "g_katz_bounded",
    "g_scc_bounded",
    "g_densest_subgraph",
]


def _norm(pdf):
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        if isinstance(v, datetime):
            return v.isoformat()
        return str(v)

    cols = sorted(pdf.columns)
    return sorted(
        "|".join(cell(x) for x in r.tolist()) for _, r in pdf[cols].iterrows()
    )


def _drop_resettable_state():
    """Drop the session-persisted derived state that is NOT part of the
    stored graph, so the alternate run truly recomputes it under the new
    partitioning (otherwise the cache masks the very aggregation paths
    these picks exist to stress)."""
    from kinbaku_spark.queries import dedup_state, extensions, kmeans_state, mlprep_ext2

    dedup_state.reset()
    kmeans_state.reset()
    for df in extensions._CLUSTER_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    extensions._CLUSTER_CACHE.clear()
    for df in mlprep_ext2._PQ_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    mlprep_ext2._PQ_CACHE.clear()


@pytest.mark.parametrize("name", PICKS)
def test_result_is_partition_count_invariant(name, spark, sf_dir):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    _drop_resettable_state()
    ref = _norm(QUERIES[name](spark, sf_dir).toPandas())
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        _drop_resettable_state()
        alt = _norm(QUERIES[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
        _drop_resettable_state()
    assert ref == alt, f"{name}: result depends on shuffle partition count"
