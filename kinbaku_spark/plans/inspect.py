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
