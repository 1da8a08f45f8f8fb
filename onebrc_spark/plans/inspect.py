"""Physical-plan assertions — the engine's "did Catalyst do what we rely on"
toolkit (SURVEY §4's built-in-rewrite table, made checkable).

tests/test_plans.py uses these to pin the load-bearing plan properties:
filters push into the parquet scan, projections prune the read schema, dim
joins broadcast, the flagship aggregate is partial+final with exactly one
exchange. These assertions are what makes "designed for 100 TB" a tested
property instead of a comment.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan node in the plan."""
    txt = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", txt)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names in each scan's ReadSchema (column-pruning witness)."""
    txt = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", txt)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]


def num_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators (excluding reused exchanges).

    Uses simple mode: formatted mode lists bare node names with arguments in
    a separate section, so the partitioning spec isn't on the Exchange line.
    """
    txt = explain_str(df, mode="simple")
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", txt))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more of the plan fused)."""
    txt = explain_str(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt)))
