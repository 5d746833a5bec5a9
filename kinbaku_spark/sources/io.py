"""Generic source/sink layer.

The reference reads/writes exactly one format: its own mmap'd binary file
(graph.py:282-331). Here the engine speaks the standard lake formats —
Parquet (default), CSV, JSON, ORC — for both the graph tables and arbitrary
DataFrames, with schema pinning on read (never infer in production paths:
inference costs an extra pass and can drift between files).

Scale notes: Parquet is the only sane default at 100 TB (columnar, predicate
pushdown, min/max pruning); CSV/JSON are ingestion/interop paths. Writers
accept partition columns so big tables land partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from kinbaku_spark.graph import Graph

FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def save_graph(g: Graph, path: str, fmt: str = "parquet") -> None:
    """Persist a graph as <path>/nodes + <path>/edges in any supported
    format (Parquet keeps the src-sorted layout; see Graph.save)."""
    if fmt == "parquet":
        g.save(path)
        return
    write_table(g.nodes_df, f"{path}/nodes", fmt)
    write_table(g.edges_df, f"{path}/edges", fmt)


def load_graph(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    nodes_schema: StructType | str | None = None,
    edges_schema: StructType | str | None = None,
    **kw,
) -> Graph:
    if fmt == "parquet":
        return Graph.load(spark, path, **kw)
    nodes = read_table(spark, f"{path}/nodes", fmt, schema=nodes_schema)
    edges = read_table(spark, f"{path}/edges", fmt, schema=edges_schema)
    if dict(edges.dtypes).get("type") != "int":
        from pyspark.sql import functions as F

        edges = edges.withColumn("type", F.col("type").cast("int"))
    return Graph(spark, nodes=nodes, edges=edges, **kw)


# ---------------------------------------------------------------------------
# Bucketed storage — the 100 TB layout. The reference keeps two BST indexes
# per node (out-edges + in-edges, graph.py:472-514) so both directions are
# O(degree); the Spark-native equivalent is TWO bucketed copies of the edge
# table, bucketed+sorted by src and by dst. Joins/groupBys on the bucket key
# are then SHUFFLE-FREE (verified: 0 Exchange in the self-join plan).
# ---------------------------------------------------------------------------

def save_graph_bucketed(
    g: Graph, name_prefix: str, buckets: int = 64
) -> None:
    """Persist a graph as bucketed tables in the session catalog:
    <prefix>_edges_by_src, <prefix>_edges_by_dst (the dual index),
    <prefix>_nodes (bucketed by key for co-located point batches)."""
    g.edges_df.write.bucketBy(buckets, "src").sortBy("src").mode(
        "overwrite"
    ).format("parquet").saveAsTable(f"{name_prefix}_edges_by_src")
    g.edges_df.write.bucketBy(buckets, "dst").sortBy("dst").mode(
        "overwrite"
    ).format("parquet").saveAsTable(f"{name_prefix}_edges_by_dst")
    g.nodes_df.write.bucketBy(buckets, "key").sortBy("key").mode(
        "overwrite"
    ).format("parquet").saveAsTable(f"{name_prefix}_nodes")


def load_graph_bucketed(
    spark: SparkSession, name_prefix: str
) -> tuple[Graph, DataFrame]:
    """Returns (graph over the src-bucketed edges, dst-bucketed edge copy).
    Use the dst copy for predecessor-heavy workloads — same data, reversed
    physical index."""
    nodes = spark.table(f"{name_prefix}_nodes")
    edges_src = spark.table(f"{name_prefix}_edges_by_src")
    edges_dst = spark.table(f"{name_prefix}_edges_by_dst")
    return Graph(spark, nodes=nodes, edges=edges_src), edges_dst
