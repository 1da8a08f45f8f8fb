"""Structured Streaming smoke tests (SURVEY §2.9): the streaming twins run
the batch-oracled plans under the incremental engine and agree with batch
results where outputMode allows a full comparison.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from onebrc_spark.sources.catalog import load_table
from onebrc_spark.streaming.pipelines import (
    read_events_stream,
    run_to_completion,
    stream_dedup,
    stream_session_windows,
    stream_tumbling_counts,
)
from tests.conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SMOKE_SF_DIR)


def test_stream_tumbling_matches_batch(spark, events_stream):
    got = run_to_completion(
        stream_tumbling_counts(events_stream), "t_tumbling", spark
    )
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows


def test_stream_sessions_run(spark, events_stream):
    got = run_to_completion(
        stream_session_windows(events_stream), "t_sessions", spark
    )
    rows = got.collect()
    assert len(rows) > 0
    assert {c for c in got.columns} == {"user_id", "session_start", "n_events"}


def test_stream_dedup_append(spark, events_stream):
    got = run_to_completion(stream_dedup(events_stream), "t_dedup", spark, mode="append")
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    assert got.count() == ev.select("event_id").distinct().count()
