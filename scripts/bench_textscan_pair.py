#!/usr/bin/env python
"""Same-day, same-protocol text-scan pair run over two TREES (VERDICT r11 #1).

The r11 clean artifact's only trusted flag was `onebrc_text_scan_agg` at
1.14x vs the r8 tree — adjudicated on best-of-2 plus re-run spread, below
the min-of-4 standard the fullsweep uses. This script settles such deltas
at protocol grade: it checks out each tree in a git worktree and runs the
text scan (cold + min-of-4 warm) in its OWN fresh JVM inside a calm window
(pre/post spark-probe gate, same band rule as bench.py), interleaving the
trees A B A B ... so a within-session host drift hits both trees equally.
One artifact, both trees, same hour — the epoch-adjudication protocol of
BENCH_OBSERVATIONAL_r11_r8tree.json applied to the flagship input path.

The per-tree runner is INJECTED (python -c) and uses only APIs present in
every tree since r8 (sources.onebrc.read_measurements_fast,
operators.aggregates.onebrc_aggregate, session.get_spark), so the old
tree's own bench.py protocol (best-of-2 there) cannot leak into the
numbers. The 50M-row text fixture under /tmp is shared by path, generated
once if absent.

Writes BENCH_OBSERVATIONAL_r{N}_textscan_pair.json (the OBSERVATIONAL
prefix keeps it outside bench.py's BENCH_r*.json reference glob).

Usage:
  python scripts/bench_textscan_pair.py --round 12 \
      --trees r8=bc38b74 r12=HEAD [--reps 2] [--runs 4]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_RUNNER = r'''
import json, sys, time
sys.path.insert(0, ".")
from onebrc_spark.session import get_spark
from onebrc_spark.operators.aggregates import onebrc_aggregate
from onebrc_spark.sources.onebrc import read_measurements_fast, write_measurements

ROWS = {rows}
DATA = "/tmp/onebrc_spark_bench/measurements_{rows}"
BAND = {band}
RUNS = {runs}

spark = get_spark("textscan_pair")
spark.range(1).count()

import pathlib
if not pathlib.Path(DATA, "_SUCCESS").exists():
    from onebrc_spark.sources.generator import generate_measurements
    write_measurements(
        generate_measurements(spark, ROWS, seed=42, num_partitions=64), DATA
    )

def probe():
    t0 = time.time()
    spark.range(0, 100_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id)) AS s"
    ).collect()
    return time.time() - t0

probe()  # untimed JIT warm
pre = probe()
waited = 0.0
while pre > BAND and waited < {calm_wait}:
    time.sleep(15)
    waited += 15
    pre = probe()

prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
runs = []
try:
    for _ in range(1 + RUNS):
        t0 = time.time()
        df = onebrc_aggregate(read_measurements_fast(spark, DATA), "station", "measure")
        n = df.count()
        runs.append(time.time() - t0)
finally:
    spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
post = probe()
print("RESULT " + json.dumps({{
    "cold": round(runs[0], 3),
    "warm_min": round(min(runs[1:]), 3),
    "warm_runs": [round(r, 3) for r in runs[1:]],
    "pre": round(pre, 3), "post": round(post, 3),
    "clean": pre <= BAND and post <= BAND,
    "stations": n,
}}))
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--trees", nargs="+", required=True,
                    help="name=committish pairs, e.g. r8=bc38b74 r12=HEAD")
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved repetitions per tree (each = fresh JVM)")
    ap.add_argument("--runs", type=int, default=4,
                    help="timed warm runs per rep (min kept) — the r12 floor")
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--calm-wait", type=float, default=300.0)
    args = ap.parse_args()

    from bench import _probe_band  # noqa: E402 (repo-root module)

    band = _probe_band(REPO)
    trees: dict[str, Path] = {}
    for spec in args.trees:
        name, _, ref = spec.partition("=")
        sha = subprocess.run(
            ["git", "rev-parse", ref], cwd=REPO, capture_output=True, text=True,
            check=True,
        ).stdout.strip()
        wt = Path(f"/tmp/onebrc_tree_{name}_{sha[:8]}")
        if not (wt / "onebrc_spark").exists():
            subprocess.run(
                ["git", "worktree", "add", "--detach", str(wt), sha],
                cwd=REPO, check=True,
            )
        trees[name] = wt
        print(f"# tree {name} = {sha[:12]} at {wt}", file=sys.stderr)

    results: dict[str, list[dict]] = {n: [] for n in trees}
    order = list(trees.items())
    for rep in range(args.reps):
        # ABBA counterbalancing: the first pair run of this session showed a
        # MONOTONE within-session drift (+~0.15 s per successive JVM on both
        # trees) — a fixed A,B interleave hands tree A the earlier, faster
        # position every rep and manufactures a tree delta out of pure
        # position. Reversing the order each rep balances the positions.
        for name, wt in (order if rep % 2 == 0 else list(reversed(order))):
            code = _RUNNER.format(rows=args.rows, band=band, runs=args.runs,
                                  calm_wait=args.calm_wait)
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, "-c", code], cwd=wt,
                capture_output=True, text=True,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
                None,
            )
            if line is None:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-4000:], file=sys.stderr)
                raise SystemExit(f"runner failed for tree {name} rep {rep}")
            r = json.loads(line[len("RESULT "):])
            r["rep"] = rep
            r["elapsed_total"] = round(time.time() - t0, 1)
            results[name].append(r)
            print(f"# {name} rep {rep}: warm_min {r['warm_min']}s cold "
                  f"{r['cold']}s (pre {r['pre']} post {r['post']} "
                  f"clean={r['clean']})", file=sys.stderr, flush=True)

    summary = {}
    for name, reps in results.items():
        clean = [r for r in reps if r["clean"]] or reps
        summary[name] = {
            "warm_min_of_all": min(r["warm_min"] for r in clean),
            "cold_min": min(r["cold"] for r in clean),
            "all_clean": all(r["clean"] for r in reps),
        }
    names = list(trees)
    if len(names) == 2:
        a, b = names
        summary["warm_ratio"] = round(
            summary[b]["warm_min_of_all"] / summary[a]["warm_min_of_all"], 3
        )
        summary["ratio_direction"] = f"{b}/{a}"
    doc = {
        "metric": "textscan_tree_pair_min_of_4",
        "runs_per_rep": args.runs,
        "reps_per_tree": args.reps,
        "rows": args.rows,
        "probe_band": band,
        "trees": {n: str(p) for n, p in trees.items()},
        "reps": results,
        "summary": summary,
    }
    out = REPO / f"BENCH_OBSERVATIONAL_r{args.round:02d}_textscan_pair.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
