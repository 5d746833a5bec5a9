from kinbaku_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_pushed_filter,
    read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filter",
    "read_schema_columns",
    "whole_stage_codegen_spans",
]
