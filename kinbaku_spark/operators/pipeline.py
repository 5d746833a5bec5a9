"""End-to-end corpus curation — the composed LLM-training-data pipeline:

    raw docs -> quality filter -> MinHash-LSH near-dup clustering ->
    keep one representative per cluster -> curated corpus + stats

Every stage is an operator from this package, so the whole pipeline is one
declarative DataFrame graph: Catalyst sees through the composition (filters
push into the scan feeding the shingle explode; the cluster join is a
semi-join). The DuckDB oracle replays the identical composition.

Scale: quality filtering prunes BEFORE shingling (the expensive stage);
clustering runs only on near-dup pairs (tiny vs corpus); the final
representative selection is one semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kinbaku_spark.operators.dedup import duplicate_clusters, minhash_near_duplicates
from kinbaku_spark.operators.text import text_quality


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.72,
    dup_threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns the curated corpus: quality-filtered, near-dup-collapsed
    (cluster representative = min doc id), with the quality score attached.
    """
    quality = text_quality(docs).select(id_col, "quality_score")
    filtered = docs.join(
        quality.filter(F.col("quality_score") >= min_quality), id_col
    )
    pairs = minhash_near_duplicates(
        filtered, threshold=dup_threshold, n_hashes=n_hashes, bands=bands
    )
    clusters = duplicate_clusters(filtered, pairs, id_col)
    representatives = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(
        id_col
    )
    return filtered.join(representatives, id_col, "left_semi").select(
        id_col, "lang", "source", "quality_score"
    )
