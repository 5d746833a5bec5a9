"""Character-level (edit-distance) near-duplicate detection.

The dedup family so far works at token/shingle granularity (exact hash,
MinHash-Jaccard, SimHash, containment) or embedding granularity (cosine,
SemDeDup). This adds the character-granularity member: Levenshtein
distance, relative to the longer document — the right tool for
boilerplate-injected or lightly-templated duplicates where a handful of
character edits separate the copies.

Shape (the 100 TB story): all-pairs Levenshtein is O(n² · len²) and
never viable; the scale path is CANDIDATES-THEN-VERIFY reusing the
MinHash banded-LSH generator (operators/dedup.minhash_band_candidates —
the same 8-band equi-join that powers x_dedup_minhash, shuffle keys are
32-byte band keys, never text), then one join back to the text column and
a JVM-side `levenshtein()` verify over candidate pairs only. The verify
is built-in in BOTH engines (Spark `F.levenshtein`, DuckDB
`levenshtein`), so the oracle replays the full pipeline bit-for-bit:
same shingles, same universal-hash signatures, same bands, same verify.

Determinism: the accept test is exact integer arithmetic —
ed * 100 <= ED_REL_PCT * greatest(len_a, len_b) — and the reported
relative distance is integer ppm (truncating div), so the value hash is
exact, no float rounding anywhere.

Reference parity: the reference (kerighan/kinbaku) has no text dedup at
all (SURVEY.md §2.4) — this extends the brief's dedup requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kinbaku_spark.operators.dedup import minhash_band_candidates
from kinbaku_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

ED_REL_PCT = 20  # accept pairs within 20% of the longer doc's length


def x_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicates: MinHash band candidates (same
    generator as x_dedup_minhash), verified by relative Levenshtein —
    ed <= 20% of the longer document's length. Output: the pair, the
    exact edit distance, and the relative distance in ppm."""
    from kinbaku_spark.queries.dedup_state import shingle_state
    from kinbaku_spark.queries.extensions import N_BANDS, N_HASHES

    docs = load_table(spark, sf_dir, "documents")
    _, sig = shingle_state(spark, sf_dir)
    cand = minhash_band_candidates(sig, "doc_id", N_HASHES, N_BANDS)
    texts = docs.select("doc_id", "text")
    ed = F.levenshtein("text_a", "text_b")
    mx = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        cand.join(
            texts.select(
                F.col("doc_id").alias("doc_id_a"), F.col("text").alias("text_a")
            ),
            "doc_id_a",
        )
        .join(
            texts.select(
                F.col("doc_id").alias("doc_id_b"), F.col("text").alias("text_b")
            ),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            ed.cast("int").alias("edit_dist"),
            mx.alias("mx"),
        )
        .filter(F.col("edit_dist") * 100 <= ED_REL_PCT * F.col("mx"))
        .select(
            "doc_id_a",
            "doc_id_b",
            "edit_dist",
            F.expr("CAST(edit_dist AS BIGINT) * 1000000 div mx").alias("rel_ppm"),
        )
        .orderBy("doc_id_a", "doc_id_b")
    )


def _edit_distance_sql() -> str:
    from kinbaku_spark.queries.extensions import _minhash_sql

    # reuse x_dedup_minhash's CTE chain up to `cand`, swap the verify tail
    base = _minhash_sql()
    head, _tail = base.split("sizes AS", 1)
    return (
        head
        + f"""t AS (SELECT doc_id, text FROM documents)
SELECT c.doc_id_a, c.doc_id_b,
       CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist,
       CAST(CAST(levenshtein(a.text, b.text) AS BIGINT) * 1000000
            // GREATEST(LENGTH(a.text), LENGTH(b.text)) AS BIGINT) AS rel_ppm
FROM cand c
JOIN t a ON a.doc_id = c.doc_id_a
JOIN t b ON b.doc_id = c.doc_id_b
WHERE levenshtein(a.text, b.text) * 100
      <= {ED_REL_PCT} * GREATEST(LENGTH(a.text), LENGTH(b.text))
ORDER BY c.doc_id_a, c.doc_id_b
"""
    )


QUERIES["x_dedup_edit_distance"] = x_dedup_edit_distance
ORACLES["x_dedup_edit_distance"] = _edit_distance_sql()
