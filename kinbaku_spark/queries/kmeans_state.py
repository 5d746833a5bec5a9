"""Session-persisted canonical k-means assignment state.

Five registered queries consume the IDENTICAL deterministic Lloyd's
assignment over the embeddings corpus (k = pipeline_ext2.KMEANS_K,
rounds = KMEANS_ROUNDS, seeded on vec_id < k): x_kmeans_clusters,
x_semantic_dedup, x_cluster_purity, x_label_noise_detect and
x_topic_diversity. Each used to re-run :func:`kmeans_assign`'s serial
construction-time driver loop per call — a seeds collect plus, per Lloyd's
round, a full assignment pass feeding the d*k centroid collect (~13 serial
jobs per query, r07 work profile).

Same "stored engine state" framing as the dedup index tables
(queries/dedup_state.py): a production pipeline clusters the corpus once
and every downstream consumer (topic mix, purity eval, SemDeDup, noise
screen) reads the stored assignment; it is refreshed on ingest, not
re-derived per query. Here it is built once per sf_dir and injected via
the ``assigned=`` parameter of :func:`kmeans_clusters` /
:func:`semantic_dedup`, or selected directly.

Stored as an eager :func:`pin` (localCheckpoint leaf), not persist:
semantic_dedup references the table three times in one plan (sizes,
pair cells, final rollup) and several consumers broadcast aggregates
derived from it — a lazy pin would let the broadcast job race the main
action's materialization, and a persisted table embeds its origin lineage
at every reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinbaku_spark.sources.tables import load_table

_ASSIGN_STATE: dict[str, DataFrame] = {}


def assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, cluster, sim): the pinned canonical k-means
    assignment over the embeddings corpus (KMEANS_K / KMEANS_ROUNDS)."""
    if sf_dir not in _ASSIGN_STATE:
        from kinbaku_spark.operators.similarity import kmeans_assign
        from kinbaku_spark.plans.checkpoints import pin
        from kinbaku_spark.queries.pipeline_ext2 import KMEANS_K, KMEANS_ROUNDS

        emb = load_table(spark, sf_dir, "embeddings")
        _ASSIGN_STATE[sf_dir] = pin(
            kmeans_assign(emb, k=KMEANS_K, rounds=KMEANS_ROUNDS)
        )
    return _ASSIGN_STATE[sf_dir]


def reset() -> None:
    """Drop the pinned assignment (tests rebuilding hermetic plans);
    checkpoint blocks free with their RDDs."""
    _ASSIGN_STATE.clear()
