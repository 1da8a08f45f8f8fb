#!/usr/bin/env python
"""Full-registry timing sweep (VERDICT r6 #3): time EVERY registered query
at sf0.01 and write BENCH_r{N}_fullsweep.json at the repo root.

bench.py times 24 headline queries; the plan census catches shuffle-count
regressions registry-wide but not constant-factor ones — a 10x slower
expression rewrite with the same plan shape lands silently. This sweep is
the missing tripwire: one warm-ish measurement per query for all of them,
cheap enough to run once per round (≈ the freeze gate's cost), consumed by
tests/test_bench_fullsweep.py which compares the two newest sweep artifacts
on NOISE-NORMALIZED per-query ratios (same estimator as bench.py: the
median raw ratio over common queries is the host factor; a query is flagged
only when its own ratio exceeds 1.5x the median).

Protocol per query: one untimed build+count (warms codegen for THIS plan),
then --runs timed runs (default 2), keep the min — the steady-state cost of
the plan, the thing a regression changes. Raise --runs when the host is
noisy: round 9 measured two SAME-TREE sweeps flagging two DISJOINT sets of
>1.5x "regressions" (GC pauses landing on random sub-second queries while
the calibration probes read a stable host) — min-of-4 per query removed
every flap; the sweep-pair adjudication rule is that a flag must survive a
same-tree re-sweep before it is treated as code. The pair-set/label memos are cleared once at
the start (standalone accounting), then left warm: consumers measure
marginal cost exactly as in a production drive.

Usage: python scripts/bench_fullsweep.py --round 7 [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from onebrc_spark import registry  # noqa: E402
from onebrc_spark.operators.clustering import clear_components_cache  # noqa: E402
from onebrc_spark.operators.dedup import clear_pair_cache  # noqa: E402
from onebrc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=2,
                    help="timed runs per query (min kept); raise on noisy hosts")
    args = ap.parse_args()

    from bench import _median, run_calibration  # noqa: E402 (repo-root module)

    spark = get_spark("onebrc_fullsweep")
    spark.range(1).count()
    clear_pair_cache()
    clear_components_cache()

    cal: list = []
    run_calibration(spark, cal)
    all_q = registry.load_all()
    times: dict[str, float] = {}
    t_start = time.time()
    for i, (name, q) in enumerate(all_q.items()):
        try:
            q.fn(spark, args.sf_dir).count()  # untimed warm (codegen)
            runs = []
            for _ in range(args.runs):
                t0 = time.time()
                q.fn(spark, args.sf_dir).count()
                runs.append(time.time() - t0)
            times[name] = round(min(runs), 3)
        except Exception as exc:  # record, don't abort the sweep
            times[name] = None
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
        if (i + 1) % 50 == 0:
            run_calibration(spark, cal)  # noise trajectory through the sweep
        print(f"# [{i + 1}/{len(all_q)}] {name}: {times[name]}s",
              file=sys.stderr, flush=True)
    run_calibration(spark, cal)

    doc = {
        "metric": "fullsweep_total_wall_clock",
        "value": round(sum(v for v in times.values() if v), 3),
        "unit": "sec",
        "elapsed_sec": round(time.time() - t_start, 1),
        "queries": times,
        "runs_per_query": args.runs,
        "sf": args.sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "calibration": {
            "samples": cal,
            "spark_probe_sec": _median([s["spark_probe_sec"] for s in cal]),
            "cpu_spin_sec": _median([s["cpu_spin_sec"] for s in cal]),
        },
    }
    out = REPO / f"BENCH_r{args.round:02d}_fullsweep.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out} ({len(times)} queries, total {doc['value']}s)")


if __name__ == "__main__":
    main()
