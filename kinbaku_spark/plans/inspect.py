"""Physical-plan inspection utilities.

Plan shape is a correctness property at scale: a filter that doesn't reach
the parquet scan re-reads 100 TB; a dimension join that doesn't broadcast
shuffles it. These helpers make plan properties assertable in tests
(tests/test_plans.py) so regressions in pushdown/broadcast/codegen fail CI,
not production.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning
    ``fragment`` (column name, usually)."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan — column-pruning
    evidence (a 2-column projection must not scan 16 columns)."""
    out = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols = [c.split(":")[0] for c in inner.split(",") if ":" in c]
            out.append(cols)
    return out


def _walk_logical(node):
    yield node
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk_logical(it.next())


def unpartitioned_windows(df: DataFrame) -> list[dict]:
    """Every Window node in the OPTIMIZED logical plan whose partition
    spec is EMPTY — the single-task global-sort shape Spark itself warns
    about ("No Partition Defined for Window operation") — or consists
    ONLY of literal expressions (a constant key is the same single-task
    global window; operators/rank.py uses one to declare its P-row
    offsets windows bounded without tripping Spark's warning, and this
    detector deliberately still reports it so a constant key can never
    hide a real global sort from the canary). Returns one dict per hit
    with boundedness evidence so tests can assert each sits on a bounded
    input (tests/test_window_canary.py):

    - ``exprs``: the window expressions (simpleString)
    - ``child``: the child plan's treeString (what the window sorts)
    - ``bounded_offsets``: child is the P-row per-range-partition totals
      table of operators/rank.py / operators/ids.py (grouping on the
      synthetic ``__pid`` partition id — at most one row per partition)
    - ``bounded_limit``: a Limit sits between the window and any scan, so
      the window input is at most that constant number of rows

    An empty return means no empty-partition-spec window anywhere in the
    plan. Runs on the optimized logical plan (pre-AQE, no execution).
    """
    jplan = df._jdf.queryExecution().optimizedPlan()
    hits: list[dict] = []
    for node in _walk_logical(jplan):
        if node.getClass().getSimpleName() != "Window":
            continue
        spec = node.partitionSpec()
        if not spec.isEmpty():
            all_literal = True
            it = spec.iterator()
            while it.hasNext():
                if it.next().getClass().getSimpleName() != "Literal":
                    all_literal = False
                    break
            if not all_literal:
                continue
        child = node.child()
        child_tree = child.treeString()
        # the rank.py offsets shape: Aggregate grouped on __pid directly
        # under the window (possibly through a Project) — P rows, one per
        # range partition, bounded by spark.default.parallelism
        bounded_offsets = False
        probe = child
        for _ in range(3):
            name = probe.getClass().getSimpleName()
            if name == "Aggregate":
                bounded_offsets = "__pid" in probe.groupingExpressions().toString()
                break
            ch = probe.children()
            if ch.size() != 1:
                break
            probe = ch.iterator().next()
        bounded_limit = any(
            n.getClass().getSimpleName()
            in ("GlobalLimit", "LocalLimit", "Limit")
            for n in _walk_logical(child)
        )
        hits.append(
            {
                "exprs": node.windowExpressions().toString(),
                "child": child_tree,
                "bounded_offsets": bounded_offsets,
                "bounded_limit": bounded_limit,
            }
        )
    return hits


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (wider is better —
    expressions stay JVM-side). AQE hides codegen annotations in explain
    output — disable AQE (or explain a cached/finalized subplan) before
    asserting; counts both notations."""
    plan = explain_str(df, mode="formatted")
    ids = set()
    for line in plan.splitlines():
        if "[codegen id :" in line:
            ids.add(line.split("[codegen id :", 1)[1].split("]", 1)[0].strip())
    if ids:
        return len(ids)
    return explain_str(df, mode="simple").count("WholeStageCodegen")
