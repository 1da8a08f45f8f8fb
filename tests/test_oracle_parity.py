"""The t2 gate, locally: every registered query vs its DuckDB oracle at sf0.01.

This is the reference's implicit differential-testing strategy (five
implementations of one query compared by eye — SURVEY §5.1) made formal and
automatic, exactly as the driver does it.
"""

from __future__ import annotations

import pytest

from onebrc_spark import registry
from tests.compare import assert_match
from tests.conftest import SF_DIR

ALL = registry.load_all()
WITH_ORACLE = sorted(n for n, q in ALL.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    q = ALL[name]
    sdf = q.fn(spark, SF_DIR)
    rel = duck.sql(q.oracle)
    assert_match(sdf, rel, name=name)


def test_every_registered_query_has_an_oracle():
    """All 161 registered queries carry a DuckDB oracle since round 3; the
    old rows-only parametrize collected zero tests and read as a permanent
    skip. Pin the invariant directly instead."""
    assert ROWS_ONLY == [], ROWS_ONLY
