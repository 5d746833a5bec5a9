"""Differential check: every declared query vs its DuckDB oracle — a local
replica of the driver's CORRECTNESS gate (row count + column names +
order-insensitive value comparison, doubles at 6 decimal places per
FIXTURES.md §5).
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from kinbaku_spark.queries import ORACLES, QUERIES

CHECKED = sorted(k for k, v in ORACLES.items() if v is not None)


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
