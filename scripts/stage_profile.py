"""Stage-level profile of one query via the UI REST API (guide §7.1).

Runs a named registry query (or the minhash build) once warm at the given
sf_dir with the Spark UI enabled, then prints every stage of the timed run:
submission→completion wall, task count, and the dominant metric.

Usage: python scripts/stage_profile.py <query_name|minhash_build> [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import SparkSession  # noqa: E402


def get_spark_ui():
    # session.py pins ui.enabled=false; build an equivalent session with UI on
    from onebrc_spark import session as S

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from onebrc_spark.streaming.protobuf_compat import ensure_protobuf, mark_session_created

    ensure_protobuf()
    b = (
        SparkSession.builder.appName("stage_profile")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .master(f"local[{cpus}]")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mark_session_created()
    return spark


def rest(app_path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{app_path}") as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark_ui()
    spark.range(1).count()

    from onebrc_spark import registry
    from onebrc_spark.operators.clustering import clear_components_cache
    from onebrc_spark.operators.dedup import clear_pair_cache, minhash_pairs

    def run():
        if name == "minhash_build":
            clear_pair_cache()
            clear_components_cache()
            minhash_pairs(spark, sf_dir).count()
        else:
            registry.load_all()[name].fn(spark, sf_dir).count()

    # warm (codegen/JIT), then the measured run
    run()
    run()
    apps = rest("applications")
    app_id = apps[0]["id"]
    jobs_before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
    t0 = time.time()
    run()
    wall = time.time() - t0
    jobs = [
        j for j in rest(f"applications/{app_id}/jobs") if j["jobId"] not in jobs_before
    ]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    print(f"=== {name} @ {sf_dir}: wall {wall:.3f}s, {len(jobs)} jobs, "
          f"{len(stage_ids)} stages ===")
    all_stages = {s["stageId"]: s for s in rest(f"applications/{app_id}/stages")}
    total = 0.0
    rows = []
    for sid in stage_ids:
        s = all_stages.get(sid)
        if s is None or s.get("status") == "SKIPPED":
            rows.append((0.0, f"  stage {sid}: SKIPPED"))
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        sub = datetime.strptime(s["submissionTime"], fmt)
        com = datetime.strptime(s["completionTime"], fmt)
        dur = (com - sub).total_seconds()
        total += dur
        rows.append(
            (
                dur,
                f"  stage {sid}: {dur:6.3f}s  tasks={s['numCompleteTasks']:4d}  "
                f"in={s['inputBytes']:>9d}  sh_r={s['shuffleReadBytes']:>8d}  "
                f"sh_w={s['shuffleWriteBytes']:>8d}  exec_ms={s['executorRunTime']:>6d}  "
                f"{s['name'].splitlines()[0][:70]}",
            )
        )
    for _, line in rows:
        print(line)
    print(f"  sum of stage walls: {total:.3f}s (overlap possible); wall {wall:.3f}s")
    # per-job gaps: time not covered by any stage = driver/scheduling
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        print(
            f"  job {j['jobId']}: {j.get('submissionTime', '?')[11:23]} -> "
            f"{j.get('completionTime', '?')[11:23]} stages={sorted(j['stageIds'])} "
            f"desc={str(j.get('description', ''))[:60]}"
        )


if __name__ == "__main__":
    main()
