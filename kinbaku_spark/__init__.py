"""kinbaku_spark — a PySpark-native engine with the capabilities of
kerighan/kinbaku (an on-disk directed-graph database), rebuilt Spark-first.

The reference (studied at /root/reference, see SURVEY.md) stores one directed
graph in a single mmap'd file with hand-rolled BST indexes. Here a graph is a
pair of DataFrames — ``nodes(key, index, ...attrs)`` and
``edges(src, dst, type, ...attrs)`` — persisted as Parquet; every reference
operator becomes declarative DataFrame algebra that Catalyst optimizes
(predicate pushdown replaces the node BST, partition layout replaces the
out-/in-edge trees, anti-join + union replaces tombstones).

Beyond reference parity, the package ships the operators a large-scale
training-data pipeline needs: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, text analysis, multimodal
column plumbing, and Structured-Streaming windowed aggregation.
"""

from kinbaku_spark.exceptions import (
    BadArgument,
    EdgeNotFound,
    KeyTooLong,
    NodeNotFound,
)
from kinbaku_spark.graph import Graph
from kinbaku_spark.session import get_spark
from kinbaku_spark.structure import Edge, Node, text

__version__ = "0.1.0"

__all__ = [
    "BadArgument",
    "Edge",
    "EdgeNotFound",
    "Graph",
    "KeyTooLong",
    "Node",
    "NodeNotFound",
    "get_spark",
    "text",
    "__version__",
]
