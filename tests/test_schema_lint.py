"""Output-schema lint over EVERY registered query (driver hash contract).

The driver's t2 gate stringifies result cells through pandas and hashes
them. Two Spark output types are structurally unsafe there regardless of
values:

  - DecimalType: Spark renders full declared scale ('1341148.6071000'),
    DuckDB's float64 renders shortest-repr ('1341148.6071') — hash red even
    when numerically identical. CORRECTNESS_r04 lost 7 rows to exactly this
    (a BIGINT / 10000.0 division: Spark types the literal as DECIMAL).
    Divide by exponent literals (1e4) or CAST(... AS DOUBLE) instead.
  - Array/Map/Struct: crashes the driver's pandas sort ("unhashable type:
    'list'") — serialize with array_join / to_json.

This test plans every registered query at the smoke SF and rejects both in
the OUTPUT schema (nested included), so the class can never reach a driver
round again. compare.py additionally hard-errors on Spark-side Decimal
cells at runtime; this sweep catches the latent ones no local test
executes with data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from onebrc_spark import registry
from tests.conftest import SMOKE_SF_DIR

ALL = registry.load_all()


def _bad_types(dt: T.DataType, path: str) -> list[str]:
    out = []
    if isinstance(dt, T.DecimalType):
        out.append(f"{path}: {dt.simpleString()} (DecimalType)")
    if isinstance(dt, (T.ArrayType, T.MapType)):
        # complex containers crash the driver's pandas canonicalizer
        out.append(f"{path}: {dt.simpleString()} (array/map)")
        return out
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            out.extend(_bad_types(f.dataType, f"{path}.{f.name}"))
    return out


@pytest.mark.parametrize("name", sorted(ALL))
def test_output_schema_is_driver_hashable(spark, name):
    df = ALL[name].fn(spark, SMOKE_SF_DIR)
    problems = []
    for field in df.schema.fields:
        problems.extend(_bad_types(field.dataType, field.name))
    assert not problems, (
        f"{name}: driver-unhashable output column type(s) — cast Decimals to "
        f"DOUBLE in-query (1e4-style literals), serialize arrays:\n  "
        + "\n  ".join(problems)
    )
