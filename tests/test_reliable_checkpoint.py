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
    baseline_rows = QUERIES[name](spark, sf_dir).collect()
    baseline_sig = plan_signature(QUERIES[name](spark, sf_dir))
    request.getfixturevalue("reliable")
    df = QUERIES[name](spark, sf_dir)
    assert plan_signature(df) == baseline_sig
    assert df.collect() == baseline_rows
