"""Schema migration shims for reference users.

The reference defines record schemas by subclassing dataclasses
(kinbaku/structure.py:15-104: ``Node``/``Edge`` with typed fields, plus a
``text(length)`` fixed-width helper) and passing ``node_class=/edge_class=``
to the Graph constructor. Here the same declaration maps to a Spark
StructType; fixed-width limits are lifted (Parquet strings are
variable-length — documented deviation, SURVEY.md §7.3), so ``text(n)``
simply maps to StringType.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@dataclasses.dataclass
class Node:
    """Subclass and add typed fields, exactly like the reference's
    kn.structure.Node (README.md:58-90 pattern)."""

    key: str = ""


@dataclasses.dataclass
class Edge:
    src: str = ""
    dst: str = ""
    type: int = 0


class text:  # noqa: N801 — reference-parity name (kinbaku/structure.py:108)
    """Fixed-width text marker. The length is accepted for source
    compatibility and ignored: Parquet strings are variable-length."""

    def __init__(self, length: int):
        self.length = length


_TYPE_MAP: dict[Any, Any] = {
    int: LongType(),
    float: DoubleType(),
    str: StringType(),
    bool: BooleanType(),
}


def _field_type(t: Any):
    if isinstance(t, text) or t is text:
        return StringType()
    if t in _TYPE_MAP:
        return _TYPE_MAP[t]
    if isinstance(t, str):  # string annotations (from __future__ annotations)
        return {
            "int": LongType(),
            "float": DoubleType(),
            "str": StringType(),
            "bool": BooleanType(),
        }.get(t, StringType())
    return StringType()


def schema_from_dataclass(cls, identity: tuple[str, ...]) -> StructType:
    fields = []
    names = {f.name for f in dataclasses.fields(cls)}
    for name in identity:
        if name not in names:
            raise ValueError(f"{cls.__name__} must keep identity field {name!r}")
    for f in dataclasses.fields(cls):
        fields.append(
            StructField(f.name, _field_type(f.type), f.name not in identity)
        )
    return StructType(fields)


def node_schema(node_class=Node) -> StructType:
    return schema_from_dataclass(node_class, ("key",))


def edge_schema(edge_class=Edge) -> StructType:
    return schema_from_dataclass(edge_class, ("src", "dst", "type"))
