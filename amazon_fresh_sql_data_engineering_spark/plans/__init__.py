from .explain import (
    codegen_stage_count,
    has_broadcast_join,
    has_sort_merge_join,
    has_take_ordered,
    partial_aggregation_present,
    physical_plan,
    pushed_filters,
    read_schema,
    shuffle_count,
    vectorized_scan,
)

__all__ = [
    "codegen_stage_count",
    "has_broadcast_join",
    "has_sort_merge_join",
    "has_take_ordered",
    "partial_aggregation_present",
    "physical_plan",
    "pushed_filters",
    "read_schema",
    "shuffle_count",
    "vectorized_scan",
]
