"""minhash_near_duplicates injection guards (ADVICE r02 + r03).

A parameter baked into an injected index table cannot be re-verified from
the DataFrame, so the guard trips on any EXPLICITLY-passed value alongside
the injected table (None-sentinel defaults) — and never on the default
call shape dedup_state consumers use.
"""

from __future__ import annotations

import pytest

from kinbaku_spark.operators.dedup import (
    minhash_near_duplicates,
    minhash_signatures,
    shingle_hashes,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id long, text string",
    )


def test_explicit_param_with_injected_table_raises(spark, docs):
    sh = shingle_hashes(docs, "doc_id", "text", 3)
    sig = minhash_signatures(sh, "doc_id", 32, 42)
    # even the value the table was built with trips the guard: equality
    # with what the table baked in cannot be verified
    with pytest.raises(ValueError, match="shingle_n is ignored"):
        minhash_near_duplicates(docs, sh=sh, shingle_n=3)
    with pytest.raises(ValueError, match="seed is ignored"):
        minhash_near_duplicates(docs, sh=sh, sig=sig, seed=42)


def test_default_call_shapes_pass(spark, docs):
    sh = shingle_hashes(docs, "doc_id", "text", 3)
    sig = minhash_signatures(sh, "doc_id", 32, 42)
    injected = minhash_near_duplicates(docs, sh=sh, sig=sig).collect()
    local = minhash_near_duplicates(docs).collect()
    assert sorted(map(tuple, injected)) == sorted(map(tuple, local))
    assert len(injected) == 1  # docs 1 and 2 are identical

    # seed still honored when only sh is injected (signatures built here)
    assert (
        minhash_near_duplicates(docs, sh=sh, seed=7).count() >= 1
    )


def test_sig_width_mismatch_raises(spark, docs):
    sh = shingle_hashes(docs, "doc_id", "text", 3)
    narrow = minhash_signatures(sh, "doc_id", 16, 42)
    with pytest.raises(ValueError, match="16 minhash columns"):
        minhash_near_duplicates(docs, sh=sh, sig=narrow, n_hashes=32)
