"""Near-constant-time readout for the SAMPLED dedup-recall monitor
(VERDICT r04 next-round #3, second half).

x_dedup_recall_sampled bounds the quadratic truth leg by feeding BOTH
legs from an md5-stratum sample of the corpus. The production claim is
that the modulus is turned with corpus growth so the stratum — and hence
the readout cost — stays ~constant. This drill measures exactly that:

- base (sf0.1, 5,000 docs):     modulus 2   -> ~2,500-doc stratum
- 100x (500,000 docs):          modulus 200 -> ~2,500-doc stratum

Same stratum size, ~constant wall time at a 100x corpus — the row the
full recall readouts (x_dedup_*_recall, quadratic truth leg by design)
cannot produce. The 100x corpus is the 100-shard disjoint-isomorphic
construction shared with stress_pipeline_100x.py.

Usage: python scripts/stress_recall_sampled.py
Appends the row to STRESS_PIPELINE_100X.md.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("KB_CACHE_TABLES", "1")

from stress_pipeline_100x import HUNDREDX, COPIES  # noqa: E402
from stress_pipeline_10x import BASE, build_shards  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from kinbaku_spark.functions.hashing import md5_long  # noqa: E402
from kinbaku_spark.session import get_spark  # noqa: E402
from kinbaku_spark.sources.tables import load_table  # noqa: E402


def sampled_recall(spark, sf_dir: str, mod: int):
    """x_dedup_recall_sampled with the modulus as the scale knob (the
    registered query pins mod=DEDUP_RECALL_SAMPLE_MOD for the oracle)."""
    from kinbaku_spark.operators.dedup import simhash_near_duplicates
    from kinbaku_spark.queries.extensions import (
        SIMHASH_BANDED_HAMMING,
        SIMHASH_BANDS,
        SIMHASH_MAX_HAMMING,
        _pair_recall,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(mod)) == 0
    )
    base = simhash_near_duplicates(docs, max_hamming=SIMHASH_MAX_HAMMING).select(
        "doc_id_a", "doc_id_b"
    )
    banded = simhash_near_duplicates(
        docs,
        max_hamming=SIMHASH_BANDED_HAMMING,
        banded=True,
        bands=SIMHASH_BANDS,
    ).select("doc_id_a", "doc_id_b")
    return _pair_recall(
        base, banded, ["doc_id_a", "doc_id_b"], "n_baseline", "n_banded"
    )


def run(spark, sf_dir: str, mod: int, reps: int = 2):
    best, row = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = sampled_recall(spark, sf_dir, mod).collect()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, row = dt, rows[0]
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(mod)) == 0)
        .count()
    )
    return best, row, n_docs


def sampled_emb_recall(spark, sf_dir: str, mod: int):
    """x_dedup_embedding_recall_sampled with the modulus as the scale
    knob (same contract as the simhash twin)."""
    from kinbaku_spark.operators.similarity import (
        embedding_near_duplicates,
        embedding_near_duplicates_lsh,
    )
    from kinbaku_spark.queries.extensions import (
        EMB_LSH_BANDS,
        EMB_LSH_PLANES,
        EMB_NEAR_DUP_THRESHOLD,
        _pair_recall,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            F.pmod(md5_long(F.col("vec_id").cast("string")), F.lit(mod)) == 0
        )
        .localCheckpoint(eager=True)
    )
    truth = embedding_near_duplicates(emb, threshold=EMB_NEAR_DUP_THRESHOLD).select(
        "vec_id_a", "vec_id_b"
    )
    lsh = embedding_near_duplicates_lsh(
        emb,
        threshold=EMB_NEAR_DUP_THRESHOLD,
        planes=EMB_LSH_PLANES,
        bands=EMB_LSH_BANDS,
    ).select("vec_id_a", "vec_id_b")
    return _pair_recall(truth, lsh, ["vec_id_a", "vec_id_b"], "n_truth", "n_lsh")


def run_emb(spark, sf_dir: str, mod: int, reps: int = 2):
    best, row = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = sampled_emb_recall(spark, sf_dir, mod).collect()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, row = dt, rows[0]
    return best, row


if __name__ == "__main__":
    spark = get_spark(app_name="kb_recall_sampled_drill")
    if not os.path.exists(HUNDREDX):
        t0 = time.perf_counter()
        build_shards(spark, HUNDREDX, COPIES)
        print(f"built 100x corpus in {time.perf_counter() - t0:.1f}s", flush=True)

    t_base, r_base, n_base = run(spark, BASE, 2)
    t_100x, r_100x, n_100x = run(spark, HUNDREDX, 200)
    te_base, re_base = run_emb(spark, BASE, 2)
    te_100x, re_100x = run_emb(spark, HUNDREDX, 200)
    lines = [
        "",
        "## Sampled recall monitor (scripts/stress_recall_sampled.py,"
        " round 5)",
        "",
        "`x_dedup_recall_sampled` with the modulus turned 100x alongside"
        " the corpus, so the md5 stratum — and the quadratic truth leg —"
        " stays constant-size:",
        "",
        "| corpus | modulus | stratum docs | wall s | recall_ppm |"
        " n_baseline |",
        "|---|---|---|---|---|---|",
        f"| sf0.1 (5,000 docs) | 2 | {n_base:,} | {t_base:.2f} |"
        f" {r_base['recall_ppm']} | {r_base['n_baseline']} |",
        f"| 100x (500,000 docs) | 200 | {n_100x:,} | {t_100x:.2f} |"
        f" {r_100x['recall_ppm']} | {r_100x['n_baseline']} |",
        "",
        f"Time ratio at 100x corpus: **{t_100x / t_base:.2f}x** — the"
        " monitoring readout costs ~the same at any corpus size (the full"
        " readouts' truth leg is quadratic BY DESIGN and excluded from"
        " scale drills). The stratum filter is a pushed-down predicate on"
        " the parquet scan, so the 100x run reads more input but"
        " shingles/compares the same ~2,500 docs.",
        "",
        "Embedding twin (`x_dedup_embedding_recall_sampled`, modulus"
        " 2 -> 200 holding the vector stratum at ~1,000):",
        "",
        "| corpus | modulus | wall s | recall_ppm | n_truth |",
        "|---|---|---|---|---|",
        f"| sf0.1 (2,000 vecs) | 2 | {te_base:.2f} |"
        f" {re_base['recall_ppm']} | {re_base['n_truth']} |",
        f"| 100x (200,000 vecs) | 200 | {te_100x:.2f} |"
        f" {re_100x['recall_ppm']} | {re_100x['n_truth']} |",
        "",
        f"Embedding time ratio at 100x: **{te_100x / te_base:.2f}x**.",
    ]
    with open(os.path.join(ROOT, "STRESS_PIPELINE_100X.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
