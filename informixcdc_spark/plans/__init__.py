"""Physical-plan inspection helpers (the engine's own explain tooling)."""

from informixcdc_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_hash_join",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
