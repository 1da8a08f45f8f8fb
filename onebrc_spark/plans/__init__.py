"""Physical-plan inspection utilities (SURVEY §4)."""

from onebrc_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    num_exchanges,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "num_exchanges",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
