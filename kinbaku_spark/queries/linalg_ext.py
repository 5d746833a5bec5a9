"""Distributed PCA: top principal component by exact-integer power
iteration on the Gram matrix.

The reference's only linear-algebra surface is the boolean adjacency
export (SURVEY.md §2.1 R19); this extends the embedding-analytics layer
with the canonical two-phase PCA shape:

1. DISTRIBUTED phase — the Gram matrix via embedding_gram
   (operators/similarity.py): each Arrow batch collapses to a d(d+1)/2
   integer partial with one numpy matmul, so the shuffle moves
   O(partitions · d²) rows regardless of corpus size. This is the only
   part that touches the data.
2. DRIVER phase — 3 power-iteration rounds on the collected d×d integer
   Gram (d=64: 2,080 numbers — the same collect-small-state pattern as
   the k-means literal centroids). Python's arbitrary-precision integers
   keep every matvec EXACT; between rounds the vector is renormalized to
   1e6 scale with sign-decomposed truncating division (matching the
   SQL's CASE form, because Python's // floors while the replay must
   truncate toward zero identically in both engines).

Determinism: quantized components (floor(x·1e6)) are engine-exact; all
matvec arithmetic is exact integers (DuckDB replays in HUGEINT); the
eigenvector sign is fixed by "component with the largest magnitude
(ties: lowest dim) is positive".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

PCA_ROUNDS = 3
PCA_SCALE = 1_000_000


def _trunc_div(w: int, m: int) -> int:
    """Truncate-toward-zero (w * SCALE) / m — the CASE form the oracle
    uses, NOT Python's floor //."""
    if w < 0:
        return -(((-w) * PCA_SCALE) // m)
    return (w * PCA_SCALE) // m


def x_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus (un-centered PCA /
    spectral norm direction): exact-integer power iteration on the
    distributed Gram matrix — the dominant-variance axis used for
    whitening, ABBA-style dedup projections, and drift fingerprints.
    """
    from kinbaku_spark.operators.similarity import embedding_gram

    emb = load_table(spark, sf_dir, "embeddings")
    rows = embedding_gram(emb).collect()  # d(d+1)/2 integers
    if not rows:  # empty corpus: empty component, like the oracle
        return spark.createDataFrame([], "dim int, component_q long")
    dim = max(r["j"] for r in rows)
    g: list[list[int]] = [[0] * dim for _ in range(dim)]
    for r in rows:
        i, j, v = r["i"] - 1, r["j"] - 1, int(r["dot_q"])
        g[i][j] = v
        g[j][i] = v
    v = [1] * dim
    for _ in range(PCA_ROUNDS):
        w = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:  # zero Gram matrix: keep the uniform direction
            break
        v = [_trunc_div(x, m) for x in w]
    # sign convention: largest-|component| (ties: lowest dim) is positive
    lead = min(range(dim), key=lambda i: (-abs(v[i]), i))
    if v[lead] < 0:
        v = [-x for x in v]
    return spark.createDataFrame(
        [(i + 1, v[i]) for i in range(dim)], "dim int, component_q long"
    )


def _pca_sql() -> str:
    renorm = (
        "CASE WHEN w < 0 THEN -(((-w) * {s}) // m) ELSE (w * {s}) // m END"
    ).format(s=PCA_SCALE)
    sql = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
ex AS (
  SELECT vec_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS v FROM q
),
gram AS (
  SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
         CAST(SUM(a.v * b.v) AS BIGINT) AS dot_q
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
),
gfull AS (
  SELECT i, j, dot_q FROM gram
  UNION ALL
  SELECT j, i, dot_q FROM gram WHERE i <> j
),
v0 AS (SELECT DISTINCT i AS j, CAST(1 AS HUGEINT) AS v FROM gfull)
"""
    prev = "v0"
    for r in range(1, PCA_ROUNDS + 1):
        sql += f""",
w{r} AS (
  SELECT g.i, SUM(CAST(g.dot_q AS HUGEINT) * v.v) AS w
  FROM gfull g JOIN {prev} v ON g.j = v.j GROUP BY g.i
),
m{r} AS (SELECT MAX(ABS(w)) AS m FROM w{r}),
v{r} AS (
  SELECT i AS j, {renorm} AS v FROM w{r} CROSS JOIN m{r}
)"""
        prev = f"v{r}"
    sql += f""",
lead AS (
  SELECT v FROM {prev} ORDER BY ABS(v) DESC, j LIMIT 1
),
sgn AS (SELECT CASE WHEN (SELECT v FROM lead) < 0 THEN -1 ELSE 1 END AS s)
SELECT CAST(j AS INT) AS dim, CAST(v * (SELECT s FROM sgn) AS BIGINT)
         AS component_q
FROM {prev}
ORDER BY dim
"""
    return sql


QUERIES["x_pca_top_component"] = x_pca_top_component
ORACLES["x_pca_top_component"] = _pca_sql()
