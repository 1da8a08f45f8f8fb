"""Python Data Source (Spark 4) parity: the custom source must reproduce
generate_measurements_ca bit-for-bit — same content-addressed relation from
a Python-process reader vs the JVM expression formulation."""

from __future__ import annotations

from onebrc_spark.sources.generator import generate_measurements_ca
from onebrc_spark.sources.pysource import read_synth


def test_python_source_matches_jvm_generator(spark):
    n, seed = 2000, 7
    got = sorted(map(tuple, read_synth(spark, n, seed).collect()))
    want = sorted(map(tuple, generate_measurements_ca(spark, n, seed).collect()))
    assert got == want


def test_python_source_partition_parallelism(spark):
    df = read_synth(spark, 1000, 7)
    assert df.rdd.getNumPartitions() == 8


def test_python_stream_source_matches_batch(spark):
    """The streaming reader must deliver exactly the batch relation once
    all micro-batches have fired (offset protocol: no loss, no dup)."""
    from onebrc_spark.sources.pysource import read_synth, read_synth_stream
    from onebrc_spark.streaming.pipelines import run_to_completion

    got = run_to_completion(
        read_synth_stream(spark, n=3000, rows_per_batch=800),
        "t_pysrc_stream",
        spark,
        mode="append",
    )
    want = read_synth(spark, 3000)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
