"""Shared fixtures: one SparkSession + one DuckDB connection per test run."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("ONEBRC_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    # Fewer threads/partitions than prod defaults: test data is tiny and
    # JVM startup + task dispatch dominates.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # get_spark vendors the Cloud SDK's protobuf (VERDICT r8 #4 —
    # transformWithStateInPandas's state-server dependency) BEFORE the JVM
    # launches, so executor Python workers inherit the path; see
    # onebrc_spark/streaming/protobuf_compat.py.
    from onebrc_spark.session import get_spark

    s = get_spark("onebrc_spark_tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
