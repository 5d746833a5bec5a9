"""Semantic invariants for the behavioral/profiling/eval/stats operators —
properties the row-level DuckDB parity check cannot express (completeness,
ordering, algebraic consistency across columns)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinbaku_spark.queries import QUERIES


def test_gap_fill_calendar_is_complete(spark, sf_dir):
    rows = QUERIES["x_gap_fill_ffill"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    spans = {len(v) for v in by_type.values()}
    assert len(spans) == 1, "every type must cover the identical calendar"
    for rs in by_type.values():
        hrs = [r["hr"] for r in rs]
        assert hrs == sorted(hrs)
        deltas = {
            int((b - a).total_seconds()) for a, b in zip(hrs, hrs[1:])
        }
        assert deltas == {3600}, "hourly scaffold must have no holes"
        for r in rs:
            assert (r["n_events"] == 0) == r["gap"]


def test_group_quantiles_are_ordered_and_total(spark, sf_dir):
    rows = QUERIES["x_group_quantiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p25_cents"] <= r["median_cents"] <= r["p75_cents"]
        assert r["iqr_cents"] == r["p75_cents"] - r["p25_cents"]
    from kinbaku_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_items"] for r in rows) == n


def test_geodesic_depth1_sigma_is_one(spark, sf_dir):
    rows = QUERIES["g_geodesic_counts"](spark, sf_dir).collect()
    d = {r["key"]: r for r in rows}
    assert d["S1"]["depth"] == 0 and d["S1"]["sigma"] == 1
    # bipartite: depth-1 nodes (parts of S1) are reached by exactly one
    # shortest path; sigma grows only from depth 2 on
    for r in rows:
        if r["depth"] == 1:
            assert r["sigma"] == 1
        assert r["sigma"] >= 1


def test_transition_probs_sum_to_unity(spark, sf_dir):
    rows = QUERIES["x_event_transitions"](spark, sf_dir).collect()
    by_cur: dict[str, list] = {}
    for r in rows:
        by_cur.setdefault(r["cur"], []).append(r)
    for cur, rs in by_cur.items():
        n_from = sum(r["n_transitions"] for r in rs)
        ppm = sum(r["prob_ppm"] for r in rs)
        # floor-division ppm: within |rows| ulps below exactly 1e6
        assert 1_000_000 - len(rs) <= ppm <= 1_000_000, (cur, ppm)
        for r in rs:
            assert r["prob_ppm"] == r["n_transitions"] * 1_000_000 // n_from


def test_mrr_reciprocal_matches_rank(spark, sf_dir):
    rows = QUERIES["x_mrr_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["first_hit_rank"] >= 1
        assert r["rr_ppm"] == 1_000_000 // r["first_hit_rank"]


def test_winsorized_mean_between_bounds(spark, sf_dir):
    r = QUERIES["x_winsorized_stats"](spark, sf_dir).collect()[0]
    assert r["lo_cents"] <= r["hi_cents"]
    assert r["lo_cents"] <= r["winsorized_mean_cents"] <= r["hi_cents"]
    # clipping can only pull the mean toward the interior
    assert r["n_clip_lo"] + r["n_clip_hi"] < r["n_items"]


def test_safety_blocklist_counts_bounded(spark, sf_dir):
    for r in QUERIES["x_safety_blocklist"](spark, sf_dir).collect():
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert r["flag_ppm"] == r["n_flagged"] * 1_000_000 // r["n_docs"]


def test_seasonality_shares_and_domains(spark, sf_dir):
    rows = QUERIES["x_order_seasonality"](spark, sf_dir).collect()
    assert rows
    total_ppm = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    for r in rows:
        assert 1 <= r["month"] <= 12 and 0 <= r["dow"] <= 6
        assert r["avg_price_cents"] > 0


def test_corr_is_bounded(spark, sf_dir):
    rows = QUERIES["x_qty_price_corr"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
    from kinbaku_spark.sources.tables import load_table

    assert sum(r["n"] for r in rows) == load_table(spark, sf_dir, "lineitem").count()


def test_revenue_concentration_bounds(spark, sf_dir):
    r = QUERIES["x_revenue_concentration"](spark, sf_dir).collect()[0]
    assert 0 <= r["gini_ppm"] < 1_000_000
    # the top decile holds at least its population share of revenue
    assert 100_000 <= r["top_decile_share_ppm"] <= 1_000_000


def test_dau_never_exceeds_wau(spark, sf_dir):
    rows = QUERIES["x_dau_wau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dau"] <= r["wau"]
        assert r["stickiness_ppm"] <= 1_000_000


def test_drift_cohorts_nonempty_and_shares_sum(spark, sf_dir):
    rows = QUERIES["x_distribution_drift"](spark, sf_dir).collect()
    assert rows
    assert sum(r["n_a"] for r in rows) > 0 and sum(r["n_b"] for r in rows) > 0
    for col in ("share_a_ppm", "share_b_ppm"):
        tot = sum(r[col] for r in rows)
        assert 1_000_000 - len(rows) <= tot <= 1_000_000


def test_ks_statistic_bounded(spark, sf_dir):
    r = QUERIES["x_ks_statistic"](spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0 <= r["ks_ppm"] <= 1_000_000


def test_acf_lag_panel_bounded(spark, sf_dir):
    rows = QUERIES["x_autocorrelation"](spark, sf_dir).collect()
    assert [r["k"] for r in rows] == list(range(1, 8))
    for r in rows:
        assert r["n_pairs"] > 0 and -1.0 <= r["acf"] <= 1.0


def test_mad_outliers_consistent(spark, sf_dir):
    r = QUERIES["x_mad_outliers"](spark, sf_dir).collect()[0]
    assert r["mad_cents"] >= 0
    assert 0 <= r["n_outliers"] < r["n_days"]


def test_transitivity_bounded(spark, sf_dir):
    r = QUERIES["g_transitivity"](spark, sf_dir).collect()[0]
    assert 0 <= r["transitivity_ppm"] <= 1_000_000
    # every triangle contributes 3 wedges, so 3T <= W always
    assert 3 * r["n_triangles"] <= max(r["n_wedges"], 1)


def test_cross_val_folds_cover_corpus(spark, sf_dir):
    from kinbaku_spark.sources.tables import load_table

    rows = QUERIES["x_cross_val_folds"](spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    assert total == load_table(spark, sf_dir, "embeddings").count()
    assert {r["fold"] for r in rows} == set(range(5))


def test_session_paths_ranked_and_bounded(spark, sf_dir):
    rows = QUERIES["x_session_paths"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= r["path_len"] <= 5
        assert len(r["path"].split(">")) == r["path_len"]


def test_transitivity_wedge_sampling_estimator(spark, sf_dir, monkeypatch):
    """KB_WEDGE_SAMPLE_PPM subsamples the wedge enumeration but must keep
    the analytic wedge count exact and land the triangle estimate near the
    exact count (deterministic hash -> reproducible, not a flaky RNG)."""
    exact = QUERIES["g_transitivity"](spark, sf_dir).collect()[0]
    monkeypatch.setenv("KB_WEDGE_SAMPLE_PPM", "500000")
    est = QUERIES["g_transitivity"](spark, sf_dir).collect()[0]
    est2 = QUERIES["g_transitivity"](spark, sf_dir).collect()[0]
    assert est == est2, "hash-sampled estimate must be deterministic"
    assert est["n_wedges"] == exact["n_wedges"]
    assert est["n_proj_edges"] == exact["n_proj_edges"]
    if exact["n_triangles"] >= 20:
        # half-rate sampling on >=20 triangles: generous 3x bound, no flake
        assert exact["n_triangles"] / 3 <= est["n_triangles"] <= exact["n_triangles"] * 3
    monkeypatch.delenv("KB_WEDGE_SAMPLE_PPM")
    assert QUERIES["g_transitivity"](spark, sf_dir).collect()[0] == exact


def test_semantic_dedup_cluster_cap(spark, sf_dir):
    """max_cluster_size: a cap larger than any cluster reproduces the exact
    paper-shape result; a tight cap only ever DROPS FEWER duplicates (pairs
    across sub-buckets are skipped), never more, and keeps the membership
    partition intact."""
    from kinbaku_spark.operators.similarity import semantic_dedup
    from kinbaku_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    exact = {
        r["cluster"]: r.asDict()
        for r in semantic_dedup(emb, k=4, rounds=1).collect()
    }
    wide = {
        r["cluster"]: r.asDict()
        for r in semantic_dedup(emb, k=4, rounds=1, max_cluster_size=n).collect()
    }
    assert wide == exact
    capped = {
        r["cluster"]: r.asDict()
        for r in semantic_dedup(emb, k=4, rounds=1, max_cluster_size=8).collect()
    }
    assert set(capped) == set(exact)
    for c, row in capped.items():
        assert row["n_members"] == exact[c]["n_members"]
        assert row["n_dropped"] <= exact[c]["n_dropped"]
        assert row["n_kept"] + row["n_dropped"] == row["n_members"]
