"""Query catalog: every operator ships as a (query, oracle_sql) pair.

This is the engine's formalization of the reference's implicit test strategy
(SURVEY §5.1): the reference validates by running five implementations of the
same query and comparing; we validate by running the Spark plan and a DuckDB
oracle SQL over identical parquet and hash-comparing (driver t2 gate).

Registration rules (SURVEY §7.4 definition-of-done):
  - alias every computed column identically in Spark and oracle SQL;
  - round float aggregates in-query (both sides) so hashes are stable under
    partition-order float nondeterminism (SURVEY §7.3 #2);
  - never return a raw TimestampType column — cast to DATE / epoch BIGINT /
    string so Spark-driver and DuckDB value representations agree;
  - oracle=None marks a genuinely non-SQL-expressible op (driver then runs a
    rows-only check).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import registers queries. Order is the SURVEY §7.2 build order.
_QUERY_MODULES = [
    "onebrc_spark.operators.aggregates",
    "onebrc_spark.operators.relational",
    "onebrc_spark.operators.joins",
    "onebrc_spark.operators.windows",
    "onebrc_spark.operators.setops",
    "onebrc_spark.functions.scalar",
    "onebrc_spark.functions.arrays_json",
    "onebrc_spark.operators.eventtime",
    "onebrc_spark.operators.dedup",
    "onebrc_spark.operators.similarity",
    "onebrc_spark.operators.textops",
    "onebrc_spark.operators.multimodal",
    "onebrc_spark.operators.udfs",
    "onebrc_spark.operators.sqlsurface",
    "onebrc_spark.operators.storage",
    "onebrc_spark.operators.skew",
    "onebrc_spark.operators.mlprep",
]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL twin; None → rows-only check
    survey_ref: str  # SURVEY §2 row id(s), e.g. "A1-A7,O1"


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, survey_ref: str) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register fn as queries()[name] with its oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, survey_ref)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in load_all().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in load_all().values() if q.oracle is not None}
