"""Shared-ANSI-SQL surface: the SAME query string runs on Spark (via
``spark.sql`` over registered temp views) and on DuckDB (the oracle) —
proving the engine exposes a real SQL entry point, not just the DataFrame
API. The reference has no SQL layer anywhere (SURVEY.md: "no SQL layer, no
parser").

Dialect-intersection rules for shared strings: decimal-cast sums (exact,
order-independent), explicit INTEGER casts on year()/ROW_NUMBER() (Spark
int vs DuckDB BIGINT), full ORDER BY with tiebreaks, ordinal GROUP BY.
"""

from __future__ import annotations

from kinbaku_spark.queries.graph_queries import GRAPH_CTE, _graph
from kinbaku_spark.sources.tables import register_views

# Top-3 nations by revenue within each order-year: 3 joins + grouped decimal
# aggregate + ranking window. Runs verbatim on both engines.
SQL_TOP_NATIONS = """
WITH rev AS (
  SELECT n.n_name AS n_name, CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
rnk AS (
  SELECT n_name, yr, revenue,
         CAST(ROW_NUMBER() OVER (PARTITION BY yr ORDER BY revenue DESC, n_name) AS INTEGER) AS rnk
  FROM rev
)
SELECT n_name, yr, revenue, rnk FROM rnk WHERE rnk <= 3 ORDER BY yr, rnk
"""


def q_sql_top_nations(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(SQL_TOP_NATIONS)


# Top-10 hub parts by in-degree over the graph's SQL views (Graph.sql).
# The body is shared; the oracle prepends the graph-derivation CTE where
# Spark reads the registered g_edges view.
SQL_HUB_PARTS = """
SELECT dst AS key, CAST(COUNT(*) AS BIGINT) AS in_deg
FROM g_edges
GROUP BY dst
ORDER BY in_deg DESC, key
LIMIT 10
"""


def g_sql_hub_parts(spark, sf_dir):
    return _graph(spark, sf_dir).sql(SQL_HUB_PARTS)


# Explicit GROUPING SETS (not a rollup/cube prefix lattice) + grouping()
# markers. One shuffle: Spark expands the sets map-side. NULLS FIRST is
# spelled out — Spark defaults ASC NULLS FIRST, DuckDB NULLS LAST.
SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY g_rf, g_ls,
         l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q_sql_grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(SQL_GROUPING_SETS)


QUERIES = {
    "q_sql_top_nations": q_sql_top_nations,
    "q_sql_grouping_sets": q_sql_grouping_sets,
    "g_sql_hub_parts": g_sql_hub_parts,
}
ORACLES = {
    "q_sql_top_nations": SQL_TOP_NATIONS,
    "q_sql_grouping_sets": SQL_GROUPING_SETS,
    "g_sql_hub_parts": GRAPH_CTE + SQL_HUB_PARTS,
}
