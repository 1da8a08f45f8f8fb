"""ST6: arbitrary stateful streaming operator smoke (SURVEY §2.9, demo-only
per §7.3 #6 — no oracle; asserts the state machine produces per-user rows
consistent with batch counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from onebrc_spark.sources.catalog import load_table
from onebrc_spark.streaming.pipelines import (
    read_events_stream,
    run_to_completion,
    stream_running_user_stats,
)
from tests.conftest import SMOKE_SF_DIR


def test_stateful_running_user_stats(spark):
    stream = read_events_stream(spark, SMOKE_SF_DIR)
    got = run_to_completion(
        stream_running_user_stats(stream), "t_stateful", spark, mode="update"
    )
    rows = {r["user_id"]: (r["n_events"], r["max_value"]) for r in got.collect()}
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    want = {
        r["user_id"]: (r["n"], r["mx"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    # single finite micro-batch → final state equals batch aggregate
    assert rows == want
