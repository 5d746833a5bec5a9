"""duplicate_clusters serial tail (r08): the driver union-find path and
the distributed min-label fixpoint must produce the IDENTICAL labeling —
including on the adversarial long-chain shape the convergent kernel
exists for — and the gate must respect KB_CC_LOCAL_THRESHOLD=0."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinbaku_spark.operators.dedup import duplicate_clusters


def _run_both(spark, docs, pairs):
    old = os.environ.get("KB_CC_LOCAL_THRESHOLD")
    try:
        os.environ["KB_CC_LOCAL_THRESHOLD"] = "100000"
        local = {
            (r.doc_id, r.cluster_id)
            for r in duplicate_clusters(docs, pairs).collect()
        }
        os.environ["KB_CC_LOCAL_THRESHOLD"] = "0"
        dist = {
            (r.doc_id, r.cluster_id)
            for r in duplicate_clusters(docs, pairs).collect()
        }
    finally:
        if old is None:
            os.environ.pop("KB_CC_LOCAL_THRESHOLD", None)
        else:
            os.environ["KB_CC_LOCAL_THRESHOLD"] = old
    return local, dist


def test_local_tail_matches_distributed_chain(spark):
    # 60-hop chain + isolated docs + a separate triangle component
    n = 60
    docs = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(n + 5)], "doc_id string"
    )
    chain = [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)]
    tri = [("d060", "d061"), ("d061", "d062"), ("d060", "d062")]
    pairs = spark.createDataFrame(
        chain + tri, "doc_id_a string, doc_id_b string"
    )
    local, dist = _run_both(spark, docs, pairs)
    assert local == dist
    # chain collapses to its min; isolated docs self-label
    assert ("d059", "d000") in local
    assert ("d064", "d064") in local


def test_local_tail_matches_distributed_numeric_ids(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = spark.createDataFrame(
        [(11, 2), (2, 7), (5, 3), (9, 10)], "doc_id_a long, doc_id_b long"
    )
    local, dist = _run_both(spark, docs, pairs)
    assert local == dist
    assert (11, 2) in local and (7, 2) in local and (5, 3) in local


def test_local_tail_empty_pairs(spark):
    docs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    pairs = spark.createDataFrame([], "doc_id_a string, doc_id_b string")
    local, dist = _run_both(spark, docs, pairs)
    assert local == dist == {("a", "a"), ("b", "b")}
