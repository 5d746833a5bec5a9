"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, a DuckDB
oracle string with IDENTICAL output column names (driver contract).

Submodules register into QUERIES / ORACLES at import time.
"""

from kinbaku_spark.queries import (  # noqa: F401
    analytics,
    analytics_ext,
    audit_ext,
    behavioral_ext,
    curation_ext,
    curation_ext2,
    dedup_ext,
    dedup_ext2,
    drift_ext,
    drift_ext2,
    eval_ext,
    eval_ext2,
    graph_queries,
    graphmetrics_ext,
    graphmetrics_ext2,
    graphmetrics_ext3,
    graphmetrics_ext4,
    linalg_ext,
    media_ext,
    mining_ext,
    mining_ext2,
    mlprep_ext,
    mlprep_ext2,
    optimizer_ext,
    pipeline_ext,
    pipeline_ext2,
    pipeline_ext3,
    pipeline_ext4,
    pipeline_ext5,
    profiling_ext,
    relational,
    relational_ext,
    relational_ext3,
    reshape,
    retrieval_ext,
    setops_ext,
    sketches_ext,
    stats_ext,
    stats_ext2,
    stats_ext3,
    stats_ext4,
    summary_ext,
    sql_surface,
    temporal,
    timeseries,
    timeseries_ext,
    udf_surface,
    window_ext,
)

QUERIES: dict = {}
ORACLES: dict = {}

for mod in (
    relational,
    relational_ext,
    relational_ext3,
    analytics,
    analytics_ext,
    audit_ext,
    behavioral_ext,
    curation_ext,
    curation_ext2,
    dedup_ext,
    dedup_ext2,
    drift_ext,
    drift_ext2,
    eval_ext,
    eval_ext2,
    graph_queries,
    graphmetrics_ext,
    graphmetrics_ext2,
    graphmetrics_ext3,
    graphmetrics_ext4,
    linalg_ext,
    media_ext,
    mining_ext,
    mining_ext2,
    mlprep_ext,
    mlprep_ext2,
    optimizer_ext,
    pipeline_ext,
    pipeline_ext2,
    pipeline_ext3,
    pipeline_ext4,
    pipeline_ext5,
    profiling_ext,
    reshape,
    retrieval_ext,
    setops_ext,
    sketches_ext,
    stats_ext,
    stats_ext2,
    stats_ext3,
    stats_ext4,
    summary_ext,
    sql_surface,
    temporal,
    timeseries,
    timeseries_ext,
    udf_surface,
    window_ext,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

try:
    from kinbaku_spark.queries import extensions  # noqa: F401

    QUERIES.update(extensions.QUERIES)
    ORACLES.update(extensions.ORACLES)
except ImportError:  # extensions land incrementally
    pass

# Registry order is the driver's correctness-sample order (it checks the
# first N entries in insertion order). Round-6 rotation (VERDICT r05
# next-round #2): 244/280 unique entries are driver-green over rounds 1-5
# with 0 failures; those stay green via the local replica gate
# (tests/test_oracle_parity.py). This round's 50-entry window front-loads
# (a) the nine entries that are new or whose engine path changed this
# round — g_scc (new certified to-convergence SCC),
# x_dedup_recall_stratified (new constant-support monitor),
# g_motif_typed_chain (new named-edge motif), x_dedup_recall_sampled /
# x_dedup_embedding_recall_sampled (adaptive modulus + support columns),
# x_video_decode_mjpeg (multi-MCU frames + doc sample), g_cc_incremental
# (versioned-state GC/retention rework), g_kcore (gated keep-list pin),
# g_motif_brokers (rides the rewritten Graph.find), and the new
# classifier-eval family (x_roc_auc, x_calibration_bins, x_confusion_f1)
# — then (b) the FINAL 36 never-driver-checked entries: the 17
# local-replica-tail names plus the 19 the r03/r04 judges
# oracle-spot-checked (every registry entry has an independent oracle
# stamp; this window converts the last 36 into driver stamps — 286/286
# driver-green when CORRECTNESS_r06 lands green). The last two slots pad
# with stamped graph.py-adjacent entries.
_PRIORITY = [
    "g_scc",
    "x_dedup_recall_stratified",
    "g_motif_typed_chain",
    "x_roc_auc",
    "x_calibration_bins",
    "x_confusion_f1",
    "x_dedup_recall_sampled",
    "x_dedup_embedding_recall_sampled",
    "x_video_decode_mjpeg",
    "g_cc_incremental",
    "g_kcore",
    "g_motif_brokers",
    "x_shard_skew_audit",
    "x_packing_waste",
    "x_gap_fill_ffill",
    "x_value_histogram",
    "x_multiset_ops",
    "x_hist_quantile_accuracy",
    "x_group_quantiles",
    "x_collocations",
    "x_order_seasonality",
    "x_qty_price_corr",
    "x_revenue_concentration",
    "x_dau_wau_stickiness",
    "x_vocab_size_sweep",
    "x_label_noise_detect",
    "q_sql_top_nations",
    "x_range_frame_revenue",
    "x_embed_covariance",
    "g_closeness",
    "g_ppr_seeded",
    "x_dedup_probe",
    "x_ks_statistic",
    "x_stationary_markov",
    "x_doc_lm_score",
    "x_rrf_fusion",
    "x_temporal_split",
    "x_safety_blocklist",
    "x_keyword_extract",
    "x_sample_stratified",
    "x_zorder_layout",
    "x_ab_test_lift",
    "x_cross_source_overlap",
    "x_hard_negatives",
    "q_unpivot_balances",
    "x_histogram_equidepth",
    "x_embed_quantize",
    "x_repetition_ratio",
    "g_subgraph_coo",
    "g_adjacency_coo",
]

_missing = [k for k in _PRIORITY if k not in QUERIES]
assert not _missing, f"priority queries missing from registry: {_missing}"
QUERIES = {
    **{k: QUERIES[k] for k in _PRIORITY},
    **{k: v for k, v in QUERIES.items() if k not in _PRIORITY},
}
ORACLES = {
    **{k: ORACLES[k] for k in _PRIORITY if k in ORACLES},
    **{k: v for k, v in ORACLES.items() if k not in _PRIORITY},
}
