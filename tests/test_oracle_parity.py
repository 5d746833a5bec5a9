"""Differential check: every declared query vs its DuckDB oracle — a local
replica of the driver's CORRECTNESS gate (row count + column names +
order-insensitive value comparison, doubles at 6 decimal places per
FIXTURES.md §5).

The FULL 286-query replica takes ~1 h and overran the driver's verify
window in round 7 (VERIFY_r07 tests_ok:false was a timeout at ~58%, zero
failures). It now runs only with KB_FULL_PARITY=1; the default suite keeps
an always-on smoke subset spanning every query class so `pytest tests/`
still has oracle coverage and finishes inside the window.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import pytest

from kinbaku_spark.queries import ORACLES, QUERIES

ALL_CHECKED = sorted(k for k, v in ORACLES.items() if v is not None)

# Always-on smoke subset: one or two entries per query class (relational q*,
# graph g_*, dedup/similarity, text, codec, stats/rank, streaming-adjacent),
# biased toward operators with round-8 engine changes.
SMOKE = [
    "q1_pricing_summary",
    "q8_market_share",
    "q_events_sessions",
    "g_out_degrees",
    "g_pagerank",
    "g_scc",
    "g_boruvka_mst",
    "g_eccentricity",
    "g_node2vec_walks",
    "g_truss_bounded",
    "g_betweenness_bounded",
    "x_coreset_kcenter",
    "x_dedup_minhash",
    "x_dedup_containment",
    "x_market_basket",
    "x_minhash_band_sweep",
    "x_semantic_dedup",
    "x_text_quality",
    "x_percentile_ranks",
    "x_ks_statistic",
    "x_hist_quantile_accuracy",
    "x_kmeans_clusters",
    "g_greedy_matching",
    "g_scc_bounded",
]

if os.environ.get("KB_FULL_PARITY") == "1":
    CHECKED = ALL_CHECKED
else:
    CHECKED = sorted(n for n in SMOKE if n in ALL_CHECKED)


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def _normalize(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    rows = []
    for _, r in pdf[cols].iterrows():
        rows.append("|".join(_norm_cell(x) for x in r.tolist()))
    return sorted(rows)


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    s_rows, o_rows = _normalize(sdf), _normalize(odf)
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
