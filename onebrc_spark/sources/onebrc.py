"""1BRC text scan & sink (SURVEY §2.1 S1/S3/S8, §2.2 P1-P5).

The reference's scan surface is: lazy CSV with ';' separator, no header,
explicit 2-column schema (`python_1brc/main.py:15`,
`rust_1brc/src/main.rs:232-236`). Its parallel variants split the file at
byte offsets and snap chunk starts to the next newline
(`python_1brc/main.py:92-101`, `rust_1brc/src/main.rs:79-122`,
`thebracket.rs:35-44`) — Spark's text sources already do exactly that split
(Hadoop LineRecordReader semantics), tuned by
`spark.sql.files.maxPartitionBytes`, so the parallel scan needs zero code.

Malformed-row semantics mirror the strict reference parsers
(`rust_1brc/src/main.rs:140-144` errors on a line without ';'): FAILFAST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onebrc_spark.schemas import MEASUREMENTS


def read_measurements(
    spark: SparkSession, path: str, mode: str = "FAILFAST"
) -> DataFrame:
    """Lazy, partitioned scan of `station;temp` text into (station, measure).

    `mode="FAILFAST"` reproduces the reference's error-on-malformed-line
    behavior (`main.rs:140-144`, `purple_mist.rs:37-38`); pass "DROPMALFORMED"
    for the python impl's skip-empty-lines behavior (`main.rs:135`).
    """
    return (
        spark.read.schema(MEASUREMENTS)
        .option("sep", ";")
        .option("header", "false")
        .option("mode", mode)
        .csv(path)
    )


def read_measurements_fast(spark: SparkSession, path: str) -> DataFrame:
    """Trusted-input scan of `station;temp` text: line reader + one split.

    The CSV reader (read_measurements) pays for quoting/escape/multi-column
    machinery a 2-column semicolon format never uses; this path reads raw
    lines and splits once — measured 18 → 25 M rows/s on 50M rows. It is
    the semantic twin of the reference's no-validation byte scanners
    (`thebracket.rs:80-107`, `rangnargrootkeorkamp.rs:137-181`): malformed
    lines yield NULL measure instead of an error, so use read_measurements
    (FAILFAST) when the input is untrusted. Everything stays in whole-stage
    codegen — substring_index + cast are JVM expressions on the scan.
    """
    return spark.read.text(path).select(
        F.substring_index("value", ";", 1).alias("station"),
        F.substring_index("value", ";", -1).cast("double").alias("measure"),
    )


def write_measurements(df: DataFrame, path: str) -> None:
    """Sink (station, measure) back to 1BRC text format (generate.rs:35)."""
    (
        df.select(
            F.concat_ws(";", F.col("station"), F.format_number(F.col("measure"), 1))
        ).write.mode("overwrite").text(path)
    )


def format_report(agg: DataFrame) -> DataFrame:
    """Morling-canonical single-line report sink (SURVEY §2.1 S8).

    Input: the flagship result (station, min, mean, max) sorted by station.
    Output: one row, one column `report` =
    `{a=min/mean/max, b=min/mean/max, ...}` — the format of
    `thebracket.rs:169-187` / `rangnargrootkeorkamp.rs:330-353`.

    Uses sort_array over collect_list so the result is deterministic without
    requiring a single-partition sort before the aggregate.
    """
    # Round to 1 dp BEFORE formatting: Spark round() and DuckDB round() agree
    # (shortest-decimal half-up), but %.1f-style formatters disagree on raw
    # ties (Java formats the shortest repr, fmt formats the binary value).
    # Formatting an already-1-dp-rounded double is stable in both.
    per_station = agg.select(
        F.format_string(
            "%s=%.1f/%.1f/%.1f",
            F.col("station"),
            F.round(F.col("min"), 1),
            F.round(F.col("mean"), 1),
            F.round(F.col("max"), 1),
        ).alias("line")
    )
    return per_station.agg(
        F.concat(
            F.lit("{"),
            F.array_join(F.sort_array(F.collect_list("line")), ", "),
            F.lit("}"),
        ).alias("report")
    )
