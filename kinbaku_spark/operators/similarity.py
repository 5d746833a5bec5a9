"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; hyperplane-LSH
bucketing is the scale path (candidates shrink by ~2^n_planes/probes). All
arithmetic is double-precision with left-to-right accumulation so the DuckDB
oracle reproduces results bit-for-bit.

At 100 TB: the corpus side stays partitioned; the query side (one vector or
a small batch) broadcasts. Brute force is one scan + one top-k
(TakeOrderedAndProject — no full sort); LSH turns it into a bucket-pruned
scan. For a real ANN index (IVF/HNSW) the bucketing below generalizes:
centroid assignment is the same broadcast-join shape.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F


def dot_double(a: Column, b: Column) -> Column:
    """Σ a_i*b_i in double, sequential accumulation (matches DuckDB)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_double(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (norm_double(a) * norm_double(b))


def cosine_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query is a literal array (broadcast by value); the plan is a single
    projection + TakeOrderedAndProject — no shuffle of the corpus.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    df = corpus
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def random_hyperplanes(n_planes: int = 16, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Fixed-seed Gaussian hyperplanes, rounded to 6dp so the identical
    literals parse to identical doubles in Spark and SQL."""
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bit signature as a long."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot_double(vec, F.array(*[F.lit(v) for v in p]))
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    max_probe_hamming: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates are vectors whose hyperplane signature
    is within ``max_probe_hamming`` bits of the query's (multi-probe LSH),
    then exact cosine re-rank. Deterministic: fixed planes, fixed probes.

    Scale: the signature is precomputable/persistable per corpus row; the
    probe is a bit_count filter (or an IN over the probe bucket set) that
    prunes the scan before any vector arithmetic.
    """
    planes = planes or random_hyperplanes(dim=len(query_vec))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qsig_row = (
        corpus.sparkSession.range(1)
        .select(lsh_signature(q, planes).alias("qsig"))
        .collect()[0]
    )
    qsig = int(qsig_row["qsig"])
    df = corpus
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    sig = lsh_signature(F.col(vec_col), planes)
    return (
        df.select(F.col(id_col), F.col(vec_col), sig.alias("sig"))
        .filter(F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_probe_hamming)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (verification baseline; the scale
    path buckets by LSH signature first — pairs above a high threshold land
    in the same or adjacent buckets with overwhelming probability)."""
    a = corpus.select(F.col(id_col).alias(f"{id_col}_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias(f"{id_col}_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .select(
            f"{id_col}_a",
            f"{id_col}_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def label_centroids(
    corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid vectors (IVF cells). Per-dimension means use exact
    decimal sums so the SQL oracle reproduces centroids bit-for-bit.

    Scale: one explode + two aggregations; at 100 TB the centroids would be
    k-means-refined and stored, but assignment/probing below is identical.
    """
    ex = corpus.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    per_dim = ex.groupBy(label_col, "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg")
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "avg"))), lambda s: s["avg"]
        ).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF-style ANN: rank cells (labels) by centroid cosine, search only the
    ``n_probe`` nearest cells, exact cosine re-rank inside them.

    Scale: the corpus is partitioned by cell; probing turns a full scan into
    reading n_probe/k_cells of the data (plus a tiny centroid table that
    always broadcasts).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cen = label_centroids(corpus, label_col, vec_col)
    probes = [
        r[label_col]
        for r in cen.select(
            label_col, cosine(F.col("centroid"), q).alias("sim")
        )
        .orderBy(F.desc("sim"), F.col(label_col))
        .limit(n_probe)
        .collect()
    ]
    df = corpus.filter(F.col(label_col).isin(probes))
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return (
        df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )
