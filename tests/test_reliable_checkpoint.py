"""KB_RELIABLE_CHECKPOINT=1 (plans/checkpoints.py, VERDICT r03 #8).

The flag swaps the long-lived pins' localCheckpoint (non-replicated
executor blocks) for a reliable checkpoint (fault-tolerant checkpoint
dir). Both materialize into a scan over the pinned rows, so downstream
plan shape AND results must be invariant under the flag — only the
storage of the pinned blocks changes.
"""

from __future__ import annotations

import os

import pytest

from kinbaku_spark.plans.checkpoints import pin, reliable_enabled
from kinbaku_spark.plans.signature import plan_signature
from kinbaku_spark.queries import QUERIES


@pytest.fixture
def reliable(spark, tmp_path):
    os.environ["KB_RELIABLE_CHECKPOINT"] = "1"
    os.environ["KB_CHECKPOINT_DIR"] = str(tmp_path / "ckpt")
    try:
        yield
    finally:
        os.environ.pop("KB_RELIABLE_CHECKPOINT", None)
        os.environ.pop("KB_CHECKPOINT_DIR", None)


def test_reliable_flag_requires_configured_dir(spark):
    """Reliable mode must refuse to default to a node-local path (each
    executor's own /tmp is the non-durable storage the flag exists to
    avoid). Must run BEFORE any test sets the session's checkpoint dir —
    setCheckpointDir is sticky for the JVM session."""
    if spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        pytest.skip("checkpoint dir already set in this session")
    os.environ["KB_RELIABLE_CHECKPOINT"] = "1"
    os.environ.pop("KB_CHECKPOINT_DIR", None)
    try:
        with pytest.raises(ValueError, match="KB_CHECKPOINT_DIR"):
            pin(spark.range(3))
    finally:
        os.environ.pop("KB_RELIABLE_CHECKPOINT", None)


def test_pin_modes(spark, reliable):
    assert reliable_enabled()
    df = pin(spark.range(5))
    assert df.count() == 5
    # a reliable checkpoint writes through the checkpoint dir
    assert spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()


@pytest.mark.parametrize(
    "name", ["x_substring_dedup", "x_substring_dedup_apply", "x_dedup_embedding_lsh"]
)
def test_plans_and_results_invariant_under_flag(spark, sf_dir, name, request):
    baseline_rows = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    baseline_sig = plan_signature(QUERIES[name](spark, sf_dir))
    request.getfixturevalue("reliable")
    df = QUERIES[name](spark, sf_dir)
    assert plan_signature(df) == baseline_sig
    # sorted: x_dedup_embedding_lsh has no orderBy, so raw collect() order
    # is partitioning-dependent and not part of the contract
    assert sorted(map(tuple, df.collect())) == baseline_rows
