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
# first N entries in insertion order). Round-7 rotation (VERDICT r06
# next-round #5): all 286 unique entries are driver-green over rounds 1-6
# with 0 failures; those stay green via the local replica gate
# (tests/test_oracle_parity.py). With the never-checked backlog closed,
# rotation now re-greens by STAMP AGE. This round's 50-entry window
# front-loads (a) the 23 entries whose engine path changed this round —
# the exact distributed rank/ntile/prefix-sum sweep (g_degree_gini,
# x_hist_quantile_accuracy, x_histogram_equidepth, x_ks_statistic,
# x_percentile_ranks, x_quality_resample, x_revenue_concentration,
# x_rfm_segmentation, x_winsorized_stats), the x_skyline_orders
# running-max fix, the limit-first top-k rewrites (x_collocations,
# g_rich_club), the TakeOrderedAndProject pagination pair
# (g_batch_nodes_page2, g_batch_edges_page2), the four ADVICE-item
# paths (x_roc_auc DECIMAL numerator, g_scc self-loop singletons,
# g_cc_incremental numeric GC ordering, the three recall monitors'
# mtime-keyed count cache), and the ppm-overflow audit's DECIMAL
# numerators (x_quality_threshold_sweep, x_dup_cluster_sizes,
# x_source_lang_impurity — found when the 100x rank drill tripped
# x_revenue_concentration's int64 share numerator) — then (b) the 27
# OLDEST-stamped entries (all r01: the TPC-H q10-q22 family, events
# windowing, set ops) so every stamp stays <= ~3 rounds old on a
# rolling basis.
_PRIORITY = [
    "g_degree_gini",
    "x_hist_quantile_accuracy",
    "x_histogram_equidepth",
    "x_ks_statistic",
    "x_percentile_ranks",
    "x_quality_resample",
    "x_revenue_concentration",
    "x_rfm_segmentation",
    "x_skyline_orders",
    "x_winsorized_stats",
    "x_collocations",
    "g_rich_club",
    "g_batch_nodes_page2",
    "g_batch_edges_page2",
    "x_roc_auc",
    "g_scc",
    "g_cc_incremental",
    "x_dedup_recall_sampled",
    "x_dedup_recall_stratified",
    "x_dedup_embedding_recall_sampled",
    "x_quality_threshold_sweep",
    "x_dup_cluster_sizes",
    "x_source_lang_impurity",
    "q10_returned_items",
    "q11_part_value",
    "q12_ship_delay_buckets",
    "q13_customer_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_or_predicates",
    "q20_promo_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q_anti_join",
    "q_cube_orders",
    "q_date_funcs",
    "q_events_json",
    "q_events_sessions",
    "q_events_sliding",
    "q_events_tumbling",
    "q_except_customers",
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
