"""Plan-shape assertions: pushdown, pruning, broadcast, codegen. These are
the scale guarantees — each assertion failing means a 100 TB run would scan
or shuffle data it shouldn't.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinbaku_spark.graph import Graph
from kinbaku_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
    whole_stage_codegen_spans,
)
from kinbaku_spark.queries import QUERIES
from kinbaku_spark.sources.tables import load_table


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate"), "date filter must reach the scan"
    cols = read_schema_columns(df)
    assert cols, "expected a parquet scan"
    # 16-column lineitem must be pruned to only the 7 referenced columns
    assert all(len(c) <= 7 for c in cols), cols


def test_q3_broadcasts_dimension(spark, sf_dir):
    df = QUERIES["q3_shipping_priority"](spark, sf_dir)
    assert has_broadcast_join(df), "customer dim must broadcast"
    assert has_pushed_filter(df, "l_shipdate")
    assert has_pushed_filter(df, "o_orderdate")


def test_point_lookup_pushdown_on_stored_graph(spark, tmp_path):
    """The reference's node BST becomes a pushed-down key filter on the
    parquet scan (SURVEY.md §1.4) — verify the filter actually reaches it."""
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 50}", 0) for i in range(50)],
        "src string, dst string, type int",
    )
    g = Graph.from_edges(edges)
    path = str(tmp_path / "g")
    g.save(path)
    g2 = Graph.load(spark, path)
    lookup = g2.nodes_df.filter(F.col("key") == "n7")
    assert has_pushed_filter(lookup, "key")
    nbrs = g2.neighbors_df("n7")
    assert has_pushed_filter(nbrs, "src")
    # neighbors projects only dst: the scan must not read weight-bearing cols
    cols = read_schema_columns(nbrs)
    assert all(set(c) <= {"src", "dst"} for c in cols), cols


def test_degree_agg_is_partial(spark, sf_dir):
    """Bulk degrees must show a partial (map-side) aggregation before the
    exchange — one shuffle of partial counts, not raw edges."""
    from kinbaku_spark.plans import explain_str

    df = QUERIES["g_out_degrees"](spark, sf_dir)
    plan = explain_str(df)
    assert "partial_count" in plan, "expected map-side partial aggregation"


def test_events_scan_pruned(spark, sf_dir):
    df = QUERIES["q_events_tumbling"](spark, sf_dir)
    cols = read_schema_columns(df)
    # events has 6 columns; the query needs ts, event_type, value
    assert all(len(c) <= 3 for c in cols), cols


def test_codegen_coverage(spark, sf_dir):
    """Hot-path queries must run inside whole-stage codegen. AQE hides
    codegen spans in explain output, so assert with AQE off — codegen is a
    static plan property either way."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ["q1_pricing_summary", "x_text_quality", "g_out_degrees"]:
            df = QUERIES[name](spark, sf_dir)
            assert whole_stage_codegen_spans(df) >= 1, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_ann_topk_no_global_sort(spark, sf_dir):
    """Top-k must be TakeOrderedAndProject (bounded), never a full Sort."""
    from kinbaku_spark.plans import explain_str

    df = QUERIES["x_ann_cosine_topk"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "TakeOrderedAndProject" in plan, plan[:500]


# -- second-wave relational shapes (relational_ext) --------------------------

def test_q13_left_outer_with_pushed_join_filter(spark, sf_dir):
    """Zero-order customers must survive (left outer) while the priority
    filter still reaches the orders scan."""
    df = QUERIES["q13_customer_distribution"](spark, sf_dir)
    plan = explain_str(df)
    assert "LeftOuter" in plan
    assert has_pushed_filter(df, "o_orderpriority")


def test_q16_in_list_pushdown_and_broadcast(spark, sf_dir):
    df = QUERIES["q16_supplier_part_counts"](spark, sf_dir)
    assert has_broadcast_join(df), "filtered part dim must broadcast"
    assert has_pushed_filter(df, "p_size"), "IN-list must reach the part scan"
    assert has_pushed_filter(df, "p_brand")


def test_q17_avg_subquery_scan_is_pruned(spark, sf_dir):
    """The per-part avg re-scan must read only (l_partkey, l_quantity) —
    at 100 TB the narrow second scan is what keeps the shape viable."""
    df = QUERIES["q17_small_qty_revenue"](spark, sf_dir)
    cols = read_schema_columns(df)
    assert any(set(c) == {"l_partkey", "l_quantity"} for c in cols), cols


def test_q19_or_of_ands_disjunct_extraction(spark, sf_dir):
    """Catalyst must extract the per-side disjunction (l_quantity ranges)
    and push it into the lineitem scan — the classic Q19 optimization."""
    df = QUERIES["q19_or_predicates"](spark, sf_dir)
    assert has_pushed_filter(df, "l_quantity")
    assert has_broadcast_join(df)


def test_q22_anti_join_with_pushed_balance_filter(spark, sf_dir):
    df = QUERIES["q22_idle_customers"](spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    assert has_pushed_filter(df, "c_acctbal")


def test_sample_stratified_is_scan_side_only(spark, sf_dir):
    """Deterministic sampling must be a pure scan-side filter: no exchange,
    no aggregate — the whole point of hash-based membership at 100 TB."""
    df = QUERIES["x_sample_stratified"](spark, sf_dir)
    plan = explain_str(df)
    assert "Exchange" not in plan, "sampling must not shuffle"
    cols = read_schema_columns(df)
    assert all(set(c) <= {"doc_id", "lang"} for c in cols), cols


# -- temporal joins & sketches (temporal.py) ---------------------------------

def test_asof_join_is_join_free(spark, sf_dir):
    """The as-of join must compile to a window over ONE key shuffle —
    any Join node means the per-key cross product came back."""
    df = QUERIES["x_asof_join"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "Join" not in plan, plan[:800]
    assert "Window" in plan, plan[:800]
    assert has_pushed_filter(df, "event_type"), "type filter must reach scan"


def test_range_join_stays_equi(spark, sf_dir):
    """The binned interval join must be a hash join on (user, bin) — a
    BroadcastNestedLoopJoin means the inequality leaked into the join and
    the plan is quadratic at scale."""
    df = QUERIES["x_range_join"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]
    assert "HashJoin" in plan, plan[:800]


def test_weighted_sample_no_global_sort(spark, sf_dir):
    """E-S top-k must be TakeOrderedAndProject (per-partition top-k +
    bounded merge), never a full Sort of the corpus."""
    df = QUERIES["x_weighted_sample"](spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_countmin_probe_broadcasts(spark, sf_dir):
    """The sketch probe (top-N x d cells) must broadcast against the
    counter matrix, not shuffle it."""
    df = QUERIES["x_countmin_freq"](spark, sf_dir)
    assert has_broadcast_join(df), "probe side must broadcast"


def test_pivot_single_shuffle(spark, sf_dir):
    """Pivot with an explicit value list must be ONE aggregation pass: no
    value-discovery scan, a single exchange."""
    df = QUERIES["q_pivot_orders"](spark, sf_dir)
    plan = explain_str(df)
    # pinning the value list means NO second scan of orders to discover
    # pivot values (that discovery pass is a full extra scan at 100 TB);
    # formatted explain lists each node twice (tree + detail), so count
    # the detail headers
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan[:400]
    # both pivot phases aggregate map-side before their exchange
    assert "partial_count" in plan and "partial_pivotfirst" in plan, (
        "expected map-side partial aggregation in both pivot phases"
    )


def test_sql_surface_broadcasts_and_prunes(spark, sf_dir):
    """The shared-SQL path goes through the same Catalyst planning: dims
    broadcast and the fact scan is column-pruned."""
    df = QUERIES["q_sql_top_nations"](spark, sf_dir)
    assert has_broadcast_join(df), "nation/customer dims must broadcast"
    cols = read_schema_columns(df)
    # lineitem (11 cols) must be pruned to the 3 referenced columns
    assert any(len(c) <= 3 for c in cols), cols


def test_pii_scrub_is_codegen_projection(spark, sf_dir):
    """PII scrubbing is a pure scan+project — inside whole-stage codegen,
    no exchange at all before the final sort."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["x_pii_scrub"](spark, sf_dir)
        assert whole_stage_codegen_spans(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_retention_single_fact_shuffle_and_broadcast(spark, sf_dir):
    """Cohort retention: the cohort map must broadcast back onto the
    distinct-day activity table — a shuffle join here would re-exchange
    the full activity stream a second time at 100 TB."""
    df = QUERIES["x_retention_cohorts"](spark, sf_dir)
    assert has_broadcast_join(df), "cohort map must broadcast"


def test_bloom_probe_broadcasts_filter_state(spark, sf_dir):
    """Bloom probing must broadcast the 128-word filter table — the whole
    point is that the fact side never shuffles to meet the filter."""
    df = QUERIES["x_bloom_prune"](spark, sf_dir)
    assert has_broadcast_join(df), "bloom words must broadcast"
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan, "probe must not sort-merge"


def test_hll_register_build_is_partial(spark, sf_dir):
    """HLL register build must partial-aggregate map-side: the shuffle
    carries (group, 256) register rows, never raw keys."""
    df = QUERIES["x_hll_distinct"](spark, sf_dir)
    plan = explain_str(df)
    assert "partial_max" in plan or "partial_count" in plan or (
        "HashAggregate" in plan and "Exchange" in plan
    ), plan[:500]


def test_market_basket_pair_join_copartitioned(spark, sf_dir):
    """The basket pair self-join must reuse the (okey)-hashed exchange of
    the distinct item table on both sides — exactly one exchange of the
    big side feeding the join, with support maps broadcast back."""
    df = QUERIES["x_market_basket"](spark, sf_dir)
    assert has_broadcast_join(df), "item-support maps must broadcast"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunking_has_no_shuffle_before_sort(spark, sf_dir):
    """Document chunking is 1→N rowwise — the only exchange allowed in the
    plan is the final presentation sort."""
    plan = _physical_plan(QUERIES["x_chunk_documents"](spark, sf_dir))
    exchanges = [
        line for line in plan.splitlines()
        if "Exchange" in line and "rangepartitioning" not in line
    ]
    assert not exchanges, exchanges


def test_scd2_windows_share_one_exchange(spark, sf_dir):
    """Both SCD2 window passes run over the same (o_custkey) partitioning:
    the plan must contain exactly one hash exchange."""
    plan = _physical_plan(QUERIES["x_scd2_history"](spark, sf_dir))
    hash_exchanges = [
        line for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert len(hash_exchanges) == 1, hash_exchanges


def test_gram_shuffle_is_partial_and_d2_sized(spark, sf_dir):
    """The Gram matrix must reduce map-side: each Arrow batch emits d(d+1)/2
    partial rows, then ONE hash exchange on (i, j) merges them. A second
    exchange (or none) would mean the corpus itself is shuffling."""
    plan = _physical_plan(QUERIES["x_embed_covariance"](spark, sf_dir))
    hash_exchanges = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert len(hash_exchanges) == 1, hash_exchanges
    assert "HashAggregate" in plan and "partial_sum" in plan.lower() or (
        plan.count("HashAggregate") >= 2
    ), "expected a partial (map-side) aggregate before the exchange"


def test_reconcile_full_outer_copartitions_once(spark, sf_dir):
    """Both pre-aggregated ledgers hash-partition on the SAME (user_id, day)
    key, so the full-outer join reuses that partitioning — two fact-side
    exchanges (one per ledger), none after."""
    plan = _physical_plan(QUERIES["x_reconcile_daily"](spark, sf_dir))
    assert "FullOuter" in plan, "join type must be full outer"
    hash_exchanges = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert len(hash_exchanges) == 2, hash_exchanges
    df = QUERIES["x_reconcile_daily"](spark, sf_dir)
    assert has_pushed_filter(df, "event_type"), "type filter must reach the scan"


def test_salted_degrees_two_phase_shuffle(spark, sf_dir):
    """Salted counting must show BOTH phases — a (key, salt) exchange and a
    (key) exchange — plus map-side partial aggregates in each."""
    plan = _physical_plan(QUERIES["g_in_degrees_salted"](spark, sf_dir))
    hash_exchanges = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    # the stored-graph derivation lineage contributes its own exchanges;
    # assert the two salted phases specifically
    salted_phase = [line for line in hash_exchanges if "__salt" in line]
    final_phase = [
        line for line in hash_exchanges
        if "__salt" not in line and "hashpartitioning(dst#" in line
    ]
    assert len(salted_phase) == 1, hash_exchanges
    assert len(final_phase) == 1, hash_exchanges


def test_repetition_ratio_rides_the_scan(spark, sf_dir):
    """The repetition filter is a per-row projection: no hash exchange may
    appear — the only allowed shuffle is the presentation sort."""
    plan = _physical_plan(QUERIES["x_repetition_ratio"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan, plan


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned writes + predicate => PartitionFilters in the scan:
    the query must only list matching directories (at 100 TB, a date/tenant
    partition predicate must never touch the other partitions' files)."""
    from pyspark.sql import functions as F

    from kinbaku_spark.plans.inspect import explain_str
    from kinbaku_spark.sources.tables import load_table

    out = str(tmp_path / "orders_part")
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderpriority"
    ).mode("overwrite").parquet(out)
    df = (
        spark.read.parquet(out)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "1-URGENT" in plan, plan
    # the partition column predicate must NOT appear as a data filter
    n = spark.read.parquet(out).filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()
    expected = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert n == expected
