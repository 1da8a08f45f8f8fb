"""Synthetic 1BRC data generator (SURVEY §2.1 S7).

Capability parity with `rust_1brc/src/bin/generate.rs:10-39`: N rows of
`station;temp`, station drawn uniformly from a fixed station table
(`generate.rs:32`), temperature ~ Normal(station_mean, station_sigma) with
sigma itself drawn from Normal(10.0, 2.5) (`generate.rs:23-29`), rounded to
one decimal (`generate.rs:34`).

Deliberately NOT copied: the reference's hard-coded 413 real-city table
(`generate.rs:41-455`) — we derive a deterministic synthetic station table of
the same cardinality and mean-range (-14.4..30.5, `FIXTURES.md §A`) instead.
The distributional shape, not the city names, is the capability.

Spark-first design: `spark.range(n)` is an embarrassingly-parallel distributed
source; the station lookup is a broadcast join against the 413-row dim (the
generator's uniform array pick *is* morally a broadcast lookup, SURVEY §2.3);
`F.randn(seed)` is per-row JVM-side. Scales to any N with zero driver memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NUM_STATIONS = 413
MEAN_LO, MEAN_HI = -14.4, 30.5


def _unit_uniform(tag: str, sid: Column, seed: int) -> Column:
    """Content-addressed uniform in (0, 1): md5(tag:seed:id) → 8 hex digits.

    Unlike F.randn, this is a pure function of the station id — identical
    under any partition layout / parallelism (randn's per-partition RNG
    stream makes 'deterministic' output depend on defaultParallelism, which
    differed between the 8-core test and 32-core bench sessions)."""
    h = F.conv(
        F.substring(F.md5(F.format_string(f"{tag}:{seed}:%d", sid)), 1, 8), 16, 10
    ).cast("double")
    return (h + 0.5) / F.lit(4294967296.0)


def station_table(spark: SparkSession, seed: int = 42) -> DataFrame:
    """Deterministic 413-row (station, mean_temp, sigma) dim table."""
    sid = F.col("id")
    mean = F.round(
        F.lit(MEAN_LO) + (F.lit(MEAN_HI - MEAN_LO) * sid) / F.lit(NUM_STATIONS - 1), 1
    )
    # sigma ~ Normal(10, 2.5) per station (generate.rs:23-29), clamped > 0.
    # Box-Muller over two content-addressed uniforms: partition-layout-proof
    # determinism (same dim table on any cluster size), same distribution.
    u1 = _unit_uniform("sigma_u1", sid, seed)
    u2 = _unit_uniform("sigma_u2", sid, seed)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    sigma = F.greatest(F.lit(0.1), F.lit(10.0) + F.lit(2.5) * z)
    return (
        spark.range(NUM_STATIONS)
        .select(
            F.format_string("station_%03d", sid).alias("station"),
            mean.alias("mean_temp"),
            sigma.alias("sigma"),
        )
    )


def generate_measurements(
    spark: SparkSession, n_rows: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """N rows of (station STRING, measure DOUBLE), 1-dp rounded."""
    rows = spark.range(0, n_rows, numPartitions=num_partitions)
    # Uniform station pick (generate.rs:32) — keyed by rand so it is not
    # correlated with id ordering.
    picked = rows.select(
        (F.floor(F.rand(seed) * NUM_STATIONS)).cast("long").alias("station_id"),
        F.randn(seed + 1).alias("z"),
    )
    dim = station_table(spark, seed).withColumn(
        "station_id", F.expr("cast(substring(station, 9) as long)")
    )
    return (
        picked.join(F.broadcast(dim), "station_id")
        .select(
            "station",
            F.round(F.col("mean_temp") + F.col("z") * F.col("sigma"), 1).alias(
                "measure"
            ),
        )
    )
