"""Plan introspection utilities (the engine's EXPLAIN surface)."""

from .inspect import (
    physical_plan,
    final_plan,
    final_plan_section,
    pushed_filters,
    read_schema,
    partition_filters,
    exchange_count,
    has_nested_loop,
    exploded_broadcast,
    has_exploded_broadcast,
    global_window_unbounded,
    has_global_window_unbounded,
)

__all__ = [
    "physical_plan",
    "final_plan",
    "final_plan_section",
    "pushed_filters",
    "read_schema",
    "partition_filters",
    "exchange_count",
    "has_nested_loop",
    "exploded_broadcast",
    "has_exploded_broadcast",
    "global_window_unbounded",
    "has_global_window_unbounded",
]
