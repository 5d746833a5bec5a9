"""Generic source/sink layer.

The reference reads/writes exactly one format: its own mmap'd binary file
(graph.py:282-331). Here the engine speaks the standard lake formats —
Parquet (default), CSV, JSON — for both the graph tables and arbitrary
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

FORMATS = ("parquet", "csv", "json")


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
