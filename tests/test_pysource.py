"""Python Data Source (Spark 4) parity: the custom source must reproduce
generate_measurements_ca bit-for-bit — same content-addressed relation from
a Python-process reader vs the JVM expression formulation."""

from __future__ import annotations

from onebrc_spark.sources.generator import generate_measurements_ca
from onebrc_spark.sources.pysource import read_synth


def test_python_source_matches_jvm_generator(spark):
    # BOTH the default seed and a non-default one: the sigma derivation
    # once hardcoded the default seed, which only a seed!=7 run can catch
    # (round-5 review)
    for n, seed in ((2000, 7), (1500, 42)):
        got = sorted(map(tuple, read_synth(spark, n, seed).collect()))
        want = sorted(
            map(tuple, generate_measurements_ca(spark, n, seed).collect())
        )
        assert got == want, f"seed={seed}"


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


def test_python_sink_commits_report_atomically(spark, tmp_path):
    """The DataSource WRITER: the committed report directory contains
    exactly the flagship lines (one per station, reference layout), a
    _SUCCESS manifest with the right row count, and no _temporary residue
    — the task-attempt/job-commit contract."""
    import json
    import pathlib

    from onebrc_spark.operators.aggregates import onebrc_flagship
    from onebrc_spark.sources.pysource import write_report
    from tests.conftest import SMOKE_SF_DIR

    agg = onebrc_flagship(spark, SMOKE_SF_DIR)
    want = sorted(
        f"{r.station}={r.min:.1f}/{r.mean:.1f}/{r.max:.1f}"
        for r in agg.collect()
    )
    out = tmp_path / "report"
    write_report(agg, str(out))
    got = sorted(
        line
        for part in pathlib.Path(out).glob("part-*.txt")
        for line in part.read_text().splitlines()
    )
    assert got == want
    manifest = json.loads((out / "_SUCCESS").read_text())
    assert manifest["rows"] == len(want)
    assert not (out / "_temporary").exists()

    # overwrite mode replaces prior parts (no stale files accumulate)
    write_report(agg, str(out))
    got2 = sorted(
        line
        for part in pathlib.Path(out).glob("part-*.txt")
        for line in part.read_text().splitlines()
    )
    assert got2 == want
