"""Property-based tests (hypothesis) — SURVEY §5.2 #3's invariant checks.

The reference's only formal test is a parser-roundtrip unit
(`rangnargrootkeorkamp.rs:361-376`); its real strategy is implicit
differential testing. These properties are the query-level generalization:
invariants that must hold for ANY generated input, not just the fixtures.

Spark jobs are expensive per example, so each property runs a small number
of examples (deadline disabled; the JVM warm-up would trip any per-example
deadline) over small generated frames.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from onebrc_spark.operators.aggregates import onebrc_aggregate
from onebrc_spark.sources.generator import NUM_STATIONS, generate_measurements

_SETTINGS = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(500, 5000))
def test_flagship_invariants_any_seed(spark, seed, n):
    """For any generated 1BRC input: min ≤ mean ≤ max per station, station
    count ≤ 413, total count preserved, output sorted by station (the
    invariant sketched at `thebracket.rs:167`)."""
    df = generate_measurements(spark, n, seed=seed, num_partitions=4)
    agg = onebrc_aggregate(df, "station", "measure").collect()
    assert 0 < len(agg) <= NUM_STATIONS
    stations = [r["station"] for r in agg]
    assert stations == sorted(stations)
    for r in agg:
        # mean is rounded to 1 dp in-query: allow half-ulp slack at the ends.
        assert r["min"] - 0.05 <= r["mean"] <= r["max"] + 0.05


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), salts=st.integers(1, 64))
def test_salting_is_semantically_invisible(spark, seed, salts):
    """Salted two-phase aggregation == plain aggregation for ANY salt count:
    decomposable aggregates (SUM/COUNT/MIN/MAX) re-combine losslessly
    regardless of how the groups are split (SURVEY §2.4 A1/A2)."""
    df = generate_measurements(spark, 2000, seed=seed, num_partitions=4).cache()
    try:
        plain = {
            r["station"]: (r["n"], round(r["s"], 6))
            for r in df.groupBy("station")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("measure").alias("s"))
            .collect()
        }
        partial = (
            df.withColumn("salt", F.pmod(F.xxhash64("measure"), F.lit(salts)))
            .groupBy("station", "salt")
            .agg(F.count(F.lit(1)).alias("pn"), F.sum("measure").alias("ps"))
        )
        salted = {
            r["station"]: (r["n"], round(r["s"], 6))
            for r in partial.groupBy("station")
            .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
            .collect()
        }
        assert salted == plain
    finally:
        df.unpersist()


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1))
def test_text_roundtrip_preserves_aggregate(spark, seed, tmp_path_factory):
    """write_measurements → read_measurements is lossless for the flagship
    aggregate: the 1-dp text format (generate.rs:34-35) carries the full
    information content of the 1-dp-rounded measures."""
    from onebrc_spark.sources.onebrc import read_measurements, write_measurements

    path = str(tmp_path_factory.mktemp("roundtrip") / f"m_{seed}")
    df = generate_measurements(spark, 1000, seed=seed, num_partitions=2).cache()
    try:
        before = sorted(
            (r["station"], r["min"], r["mean"], r["max"])
            for r in onebrc_aggregate(df, "station", "measure").collect()
        )
        write_measurements(df, path)
        back = read_measurements(spark, path)
        after = sorted(
            (r["station"], r["min"], r["mean"], r["max"])
            for r in onebrc_aggregate(back, "station", "measure").collect()
        )
        assert after == before
    finally:
        df.unpersist()


def test_minhash_identical_inputs_identical_signatures(spark):
    """MinHash: equal shingle sets ⇒ equal signatures (exact, not
    probabilistic); disjoint docs get sentinel-free distinct signatures."""
    from onebrc_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame(
        [(1, ["ab", "bc", "cd"]), (2, ["ab", "bc", "cd"]), (3, ["xy", "yz"]), (4, [])],
        "id int, shingles array<string>",
    )
    rows = {
        r["id"]: tuple(r["sig"])
        for r in df.select("id", minhash_signature(F.col("shingles")).alias("sig")).collect()
    }
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    assert len(rows[1]) == len(rows[3]) == len(rows[4]) == 12
