"""Plan introspection helpers (pushdown / broadcast / codegen assertions)."""

from mapreduceindexer_spark.plans.audit import (
    codegen_stage_count,
    explain_str,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
    with_metrics,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_hash_join",
    "codegen_stage_count",
    "with_metrics",
]
