"""Run the flagship 1BRC query at the reference's own scale: 1e9 rows of
`station;temp` text (~16 GB), the exact workload of BASELINE.md.

Usage: python scripts/onebrc_fullscale.py [n_rows]   (default 1_000_000_000)

Generates the text once under /tmp (distributed generator, SURVEY §2.1 S7),
then times scan → group-by → sort end-to-end, cold and warm, for both the
FAILFAST CSV reader and the fast line-split path. Prints one JSON line.
Baseline comparators (different hardware — i7-1185G7 4C/8T laptop):
Polars lazy-streaming 33.86 s, hand-tuned Rust 8-16 s (README.MD:28-40).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from onebrc_spark.operators.aggregates import onebrc_aggregate
from onebrc_spark.session import get_spark
from onebrc_spark.sources.generator import generate_measurements
from onebrc_spark.sources.onebrc import (
    read_measurements,
    read_measurements_fast,
    write_measurements,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000_000
DATA = f"/tmp/onebrc_spark_bench/measurements_{N}"


def main() -> None:
    spark = get_spark("onebrc_fullscale")
    spark.range(1).count()

    if not pathlib.Path(DATA, "_SUCCESS").exists():
        t0 = time.time()
        print(f"# generating {N} rows -> {DATA}", file=sys.stderr, flush=True)
        write_measurements(
            generate_measurements(spark, N, seed=42, num_partitions=256), DATA
        )
        print(f"# generated in {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    results: dict[str, float] = {}
    for label, reader in (("csv_failfast", read_measurements), ("fast", read_measurements_fast)):
        for run in ("cold", "warm"):
            t0 = time.time()
            n_stations = onebrc_aggregate(reader(spark, DATA), "station", "measure").count()
            dt = time.time() - t0
            results[f"{label}_{run}"] = round(dt, 2)
            print(
                f"# {label} {run}: {n_stations} stations in {dt:.1f}s "
                f"({N / dt / 1e6:.1f}M rows/s)",
                file=sys.stderr,
                flush=True,
            )
    print(
        json.dumps(
            {
                "metric": "onebrc_fullscale_seconds",
                "rows": N,
                "value": results["fast_warm"],
                "unit": "sec",
                "runs": results,
            }
        )
    )


if __name__ == "__main__":
    main()
