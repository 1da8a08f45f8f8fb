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
    # grid-safe: the only 2-digit ties of this /412 rational are k.25/k.75 — dyadic, both engines round half away
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


def generate_measurements_ca(
    spark: SparkSession, n_rows: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Content-addressed variant of generate_measurements: the station pick
    AND the temperature draw are pure md5 functions of the row id, so the
    output is bit-identical under any partition layout — and reproducible
    by ANY engine with md5. The `onebrc_generated` oracle regenerates the
    exact same relation in DuckDB (S7 hash-verified, not rows-only).

    ~3 md5 per row, so for bulk text generation (scripts/onebrc_fullscale)
    the rand()-based generate_measurements stays the fast path."""
    rows = spark.range(0, n_rows, numPartitions=num_partitions)
    rid = F.col("id")
    pick = F.floor(_unit_uniform("pick", rid, seed) * NUM_STATIONS).cast("long")
    u1 = _unit_uniform("temp_u1", rid, seed)
    u2 = _unit_uniform("temp_u2", rid, seed)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    picked = rows.select(pick.alias("station_id"), z.alias("z"))
    dim = station_table(spark, seed).withColumn(
        "station_id", F.expr("cast(substring(station, 9) as long)")
    )
    # + 0.0 canonicalizes IEEE -0.0 (a just-below-zero draw rounded to 1 dp)
    # to +0.0 — DuckDB preserves the sign bit through round(), Spark doesn't.
    return picked.join(F.broadcast(dim), "station_id").select(
        "station",
        # grid-safe (rulebook r13c): Box-Muller z is transcendental; a (d+1)-digit-5 tie needs a half-ulp coincidence
        (F.round(F.col("mean_temp") + F.col("z") * F.col("sigma"), 1) + 0.0).alias(
            "measure"
        ),
    )


def _unit_uniform_sql(tag: str, id_expr: str, seed: int) -> str:
    """DuckDB twin of _unit_uniform (used by the onebrc_generated oracle)."""
    return (
        f"(CAST('0x' || substring(md5(printf('{tag}:{seed}:%d', {id_expr})), 1, 8)"
        f" AS BIGINT) + 0.5) / 4294967296.0"
    )


def measurements_oracle_sql(n_rows: int, seed: int = 42) -> str:
    """DuckDB SQL regenerating generate_measurements_ca(n_rows, seed) exactly:
    same md5-uniforms, same Box-Muller, same station dim arithmetic. Float
    ops beyond +-*/ (ln, cos) agree to the double ULP between the JVM and
    DuckDB's libm for this value domain (pinned by tests and the driver
    hash); the final 1-dp round absorbs them."""
    span = repr(MEAN_HI - MEAN_LO)  # repr round-trips the exact double
    return f"""
    WITH station_ids AS (
      SELECT unnest(range({NUM_STATIONS})) AS i
    ), stations AS (
      SELECT i AS station_id,
             printf('station_%03d', i) AS station,
             round({MEAN_LO!r} + ({span} * i) / {NUM_STATIONS - 1}, 1) AS mean_temp,
             greatest(0.1, 10.0 + 2.5 * (sqrt(-2.0 * ln(
               {_unit_uniform_sql("sigma_u1", "i", seed)}
             )) * cos(2.0 * pi() * (
               {_unit_uniform_sql("sigma_u2", "i", seed)}
             )))) AS sigma
      FROM station_ids
    ), rows_ AS (
      SELECT unnest(range({n_rows})) AS id
    ), picked AS (
      SELECT CAST(floor(({_unit_uniform_sql("pick", "id", seed)}) * {NUM_STATIONS}) AS BIGINT)
               AS station_id,
             sqrt(-2.0 * ln({_unit_uniform_sql("temp_u1", "id", seed)}))
               * cos(2.0 * pi() * ({_unit_uniform_sql("temp_u2", "id", seed)})) AS z
      FROM rows_
    )
    SELECT station, round(mean_temp + z * sigma, 1) + 0.0 AS measure
    FROM picked JOIN stations USING (station_id)
    """


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
            # grid-safe (rulebook r13c): Box-Muller z is transcendental; a (d+1)-digit-5 tie needs a half-ulp coincidence
            F.round(F.col("mean_temp") + F.col("z") * F.col("sigma"), 1).alias(
                "measure"
            ),
        )
    )
