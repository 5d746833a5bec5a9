"""The unpartitioned-WindowExec canary (VERDICT r06 "What's wrong" #1).

An empty-partition-spec Window moves EVERY input row through one task —
the single-partition global sort Spark itself warns about ("No Partition
Defined for Window operation"). After the round-7 sweep, no registered
query may plan one over an unbounded (corpus- or dimension-scan-sized)
input. This test walks the optimized logical plan of every registered
query and asserts each remaining empty-partition window is bounded:

- **offsets-bounded**: the P-row per-range-partition totals table of
  operators/rank.py / operators/ids.py (detected structurally: grouping
  on the synthetic ``__pid``) — at most one row per partition;
- **limit-bounded**: a Limit sits between the window and any scan
  (top-k / pagination outputs);
- **whitelisted**: the input is an aggregate bounded by something other
  than corpus size (calendar days, fixed bucket counts, label/source
  dimensions, the <= 10^6+1 distinct-ppm score table of x_roc_auc) —
  each entry below carries its bound and the exact count of such
  windows, so ANY new unbounded window (or a regression of a swept
  query) fails the sweep test.

The negative control lives in tests/test_rank_ops.py
(test_canary_flags_naive_global_window): a deliberately naive
global-rank plan is detected as neither offsets- nor limit-bounded.
"""

from __future__ import annotations

from kinbaku_spark.plans.inspect import unpartitioned_windows
from kinbaku_spark.queries import QUERIES

# name -> (allowed unbounded-by-detector window count, input bound).
# "Unbounded-by-detector" means neither offsets- nor limit-bounded; every
# entry here must be justified by an input whose size does NOT grow with
# corpus row count (or grows only with a fixed value domain noted below).
WHITELIST: dict[str, tuple[int, str]] = {
    "x_anomaly_zscore": (1, "daily revenue series — calendar-day bounded"),
    "x_benford_check": (1, "9 first-digit cells"),
    "x_bootstrap_ci": (1, "BOOT_B=16 bootstrap-replica rows"),
    "x_class_weights": (1, "label dimension of the embeddings table"),
    "x_cusum_changepoint": (1, "daily revenue series — calendar-day bounded"),
    "x_distribution_drift": (1, "10 fixed drift buckets"),
    "x_hist_quantile_accuracy": (1, "HQ_BUCKETS fixed histogram buckets"),
    "x_mad_outliers": (
        1,
        "ad distinct-value histogram (calendar-day bounded); the c-median"
        " window (same bounded class) sits above the r07 dev pin",
    ),
    "x_mixture_weights": (1, "per-source dimension table"),
    "x_moving_agg": (1, "daily revenue series — calendar-day bounded"),
    "x_order_seasonality": (1, "month x weekday cells (<= 84)"),
    "x_range_frame_revenue": (1, "daily revenue series — calendar-day bounded"),
    "x_roc_auc": (1, "distinct integer-ppm scores (<= 10^6+1 rows)"),
    "x_rolling_features": (1, "daily revenue series — calendar-day bounded"),
    "x_value_histogram": (1, "HIST_BUCKETS=20 fixed buckets"),
    "x_vocab_growth": (1, "VOCAB_DECILES=10 decile rows"),
}


def test_no_unbounded_unpartitioned_windows(spark, sf_dir):
    """Every registered query: each empty-partition window is offsets-
    bounded, limit-bounded, or exactly matches its whitelist entry."""
    failures = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, sf_dir)
        hits = unpartitioned_windows(df)
        unbounded = [
            h
            for h in hits
            if not (h["bounded_offsets"] or h["bounded_limit"])
        ]
        allowed = WHITELIST.get(name, (0, ""))[0]
        if len(unbounded) > allowed:
            failures.append(
                f"{name}: {len(unbounded)} unbounded unpartitioned "
                f"window(s), {allowed} whitelisted; first child plan:\n"
                + unbounded[0]["child"][:800]
            )
        elif len(unbounded) < allowed:
            failures.append(
                f"{name}: whitelist is stale — allows {allowed} but plan "
                f"has {len(unbounded)}; shrink the entry"
            )
    assert not failures, "\n\n".join(failures)
