from sparvi_core_spark.plans.inspect import (
    explain_str,
    has_broadcast_hash_join,
    has_broadcast_nested_loop_join,
    has_join,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "scan_columns",
    "has_join",
    "has_broadcast_hash_join",
    "has_broadcast_nested_loop_join",
]
