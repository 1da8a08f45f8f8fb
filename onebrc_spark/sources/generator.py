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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NUM_STATIONS = 413
MEAN_LO, MEAN_HI = -14.4, 30.5


def station_table(spark: SparkSession, seed: int = 42) -> DataFrame:
    """Deterministic 413-row (station, mean_temp, sigma) dim table."""
    sid = F.col("id")
    mean = F.round(
        F.lit(MEAN_LO) + (F.lit(MEAN_HI - MEAN_LO) * sid) / F.lit(NUM_STATIONS - 1), 1
    )
    # sigma ~ Normal(10, 2.5) per station (generate.rs:23-29), clamped > 0.
    sigma = F.greatest(F.lit(0.1), F.lit(10.0) + F.lit(2.5) * F.randn(seed))
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
