"""Multi-dimensional data layout: Morton (z-order) clustering.

The 100 TB story: a table queried by BOTH customer and date can only be
physically sorted by one of them — unless rows are ordered by the
interleaved bits of the two keys. Range-partitioning + sorting on that
Morton code gives every file a tight bounding box in BOTH dimensions, so
parquet min/max stats prune scans for either predicate (what Delta's
OPTIMIZE ZORDER BY does; built here from plain DataFrame ops:
one range exchange + in-partition sort, no extra shuffle).

The z-value is a pure JVM bit expression (shifts/masks inside whole-stage
codegen, no UDF), and replays exactly in SQL — so the layout decision
itself is oracle-checkable (x_zorder_layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZBITS = 8  # bits kept per dimension (low bits of each normalized key)


def morton2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. Fixed shift/mask expression
    tree — identical in Spark and ANSI SQL."""
    term = F.lit(0).cast("long")
    for i in range(bits):
        term = (
            term
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return term


def sql_morton2(x: str, y: str, bits: int = ZBITS) -> str:
    """The same interleave in DuckDB SQL (same evaluation order)."""
    parts = ["CAST(0 AS BIGINT)"]
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as parquet clustered by the Morton code of
    (x_col, y_col): one range repartition on the z-value plus an
    in-partition sort, so each output file covers a contiguous z-range —
    a tight rectangle in (x, y) space that parquet min/max stats can
    prune on either column."""
    z = morton2(
        F.col(x_col).cast("long").bitwiseAND(F.lit((1 << bits) - 1)),
        F.col(y_col).cast("long").bitwiseAND(F.lit((1 << bits) - 1)),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
