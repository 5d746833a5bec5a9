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
    dedup_ext,
    drift_ext,
    eval_ext,
    graph_queries,
    graphmetrics_ext,
    linalg_ext,
    mining_ext,
    mining_ext2,
    mlprep_ext,
    pipeline_ext,
    pipeline_ext2,
    pipeline_ext3,
    profiling_ext,
    relational,
    relational_ext,
    relational_ext3,
    reshape,
    setops_ext,
    sketches_ext,
    stats_ext,
    stats_ext2,
    stats_ext3,
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
    dedup_ext,
    drift_ext,
    eval_ext,
    graph_queries,
    graphmetrics_ext,
    linalg_ext,
    mining_ext,
    mining_ext2,
    mlprep_ext,
    pipeline_ext,
    pipeline_ext2,
    pipeline_ext3,
    profiling_ext,
    reshape,
    setops_ext,
    sketches_ext,
    stats_ext,
    stats_ext2,
    stats_ext3,
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
