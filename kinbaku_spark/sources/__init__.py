from kinbaku_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    supplier_part_edges,
    supplier_part_nodes,
    customer_order_edges,
    user_event_edges,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "supplier_part_edges",
    "supplier_part_nodes",
    "customer_order_edges",
    "user_event_edges",
]
