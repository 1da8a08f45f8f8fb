"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``onebrc_spark`` package; this file is a thin
adapter over ``onebrc_spark.registry``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship 1BRC query (SURVEY §3.4) on /root/testdata/sf0.001."""
    from onebrc_spark.operators.aggregates import onebrc_flagship

    return onebrc_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from onebrc_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from onebrc_spark import registry

    return registry.oracle_sql()
