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

Protocol per query (r11 — VERDICT r10 #2): one untimed build+count (warms
codegen for THIS plan), then --runs timed runs (default 4 — min-of-4 is the
floor since the r9 flap study: two SAME-TREE sweeps flagged two DISJOINT
sets of >1.5x "regressions" from GC pauses on random sub-second queries;
min-of-4 removed every flap), keep the min — the steady-state cost of the
plan, the thing a regression changes.

Calm-window gating (r11, bench.py's chunked protocol): every query is
timed inside its own probe-clean window. The probe taken AFTER query i's
runs doubles as query i+1's pre-probe (one chained probe per query, ~0.2 s
each), a contended window waits on the shared ONEBRC_BENCH_CALM_WAIT
budget and retries once, and each entry is stamped with its window's
pre/post probes in `query_probes` — so the artifact proves per-number
under what host conditions it was taken, and tests/test_bench_fullsweep.py
can trust flags per-query instead of adjudicating whole contended sweeps.

The pair-set/label memos are cleared once at the start (standalone
accounting), then left warm: consumers measure marginal cost exactly as in
a production drive.

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
    ap.add_argument("--runs", type=int, default=4,
                    help="timed runs per query (min kept); 4 = the r9 flap floor")
    args = ap.parse_args()

    import os

    from bench import (  # noqa: E402 (repo-root module)
        CALM_POLL_SLEEP,
        _gc_adjudicated_post_probe,
        _median,
        _probe_band,
        _spark_probe_seconds,
        run_calibration,
    )

    spark = get_spark("onebrc_fullsweep")
    spark.range(1).count()
    clear_pair_cache()
    clear_components_cache()

    band = _probe_band(REPO)
    budget = {"left": float(os.environ.get("ONEBRC_BENCH_CALM_WAIT", "900"))}
    _spark_probe_seconds(spark)  # untimed: first fold pays JIT/codegen

    def wait_calm(last_probe: float) -> float:
        probe = last_probe
        while probe > band and budget["left"] > 0:
            wait = min(CALM_POLL_SLEEP, budget["left"])
            print(
                f"# probe {probe:.3f}s > band {band}s — waiting {wait:.0f}s "
                f"(calm budget {budget['left']:.0f}s left)",
                file=sys.stderr, flush=True,
            )
            time.sleep(wait)
            budget["left"] -= wait
            probe = _spark_probe_seconds(spark)
        return probe

    cal: list = []
    run_calibration(spark, cal)
    all_q = registry.load_all()
    times: dict[str, float] = {}
    query_probes: dict[str, dict] = {}
    probe_readings: list[float] = []
    probe = _spark_probe_seconds(spark)
    probe_readings.append(probe)
    t_start = time.time()
    for i, (name, q) in enumerate(all_q.items()):
        try:
            best = None
            attempts = 0
            while True:
                attempts += 1
                pre = wait_calm(probe)
                q.fn(spark, args.sf_dir).count()  # untimed warm (codegen)
                runs = []
                for _ in range(args.runs):
                    t0 = time.time()
                    q.fn(spark, args.sf_dir).count()
                    runs.append(time.time() - t0)
                # the post-probe chains into the NEXT query's pre-probe;
                # GC-adjudicated (VERDICT r11 #3): a contended reading
                # whose overage is measured in-process GC is flushed with
                # System.gc() and re-taken, evidence kept in the stamp
                post, gc_flush = _gc_adjudicated_post_probe(spark, band)
                probe = post
                probe_readings += [pre, post]
                sec = min(runs)
                if best is None or sec < best[0]:
                    best = (sec, pre, post, gc_flush)
                clean = pre <= band and post <= band
                if clean or budget["left"] <= 0 or attempts >= 2:
                    break
                print(
                    f"# {name}: window contended (pre {pre:.3f} post "
                    f"{post:.3f}) — one retry",
                    file=sys.stderr, flush=True,
                )
            sec, pre, post, gc_flush = best
            times[name] = round(sec, 3)
            query_probes[name] = {
                "pre": round(pre, 3), "post": round(post, 3),
                "clean": pre <= band and post <= band, "attempts": attempts,
            }
            if gc_flush:
                query_probes[name]["gc_flush"] = gc_flush
        except Exception as exc:  # record, don't abort the sweep
            times[name] = None
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            # ADVICE r11: a failing query never reaches its post-probe, so
            # without a refresh the NEXT query's pre-probe gate would
            # consume a stale reading taken BEFORE this query ran (and
            # wait_calm returns it immediately if it was in-band,
            # misrepresenting the next entry's actual window). Re-probe
            # now and stamp the errored entry clean=None — "no verdict",
            # distinct from a measured-contended window. The re-probe gets
            # its own guard (ADVICE r12): if the query failed because the
            # Spark session/JVM died, the probe raises too — fall back to
            # post=None rather than aborting the whole record-don't-abort
            # sweep.
            try:
                probe = _spark_probe_seconds(spark)
                probe_readings.append(probe)
                post_val = round(probe, 3)
            except Exception as probe_exc:
                print(f"# {name}: post-probe also failed: {probe_exc}",
                      file=sys.stderr)
                post_val = None
            query_probes[name] = {
                "pre": None, "post": post_val, "clean": None,
                "attempts": attempts, "err": True,
            }
        if (i + 1) % 50 == 0:
            run_calibration(spark, cal)  # noise trajectory through the sweep
        print(f"# [{i + 1}/{len(all_q)}] {name}: {times[name]}s "
              f"({query_probes.get(name, {})})",
              file=sys.stderr, flush=True)
    run_calibration(spark, cal)

    n_contended = sum(1 for p in query_probes.values() if not p["clean"])
    doc = {
        "metric": "fullsweep_total_wall_clock",
        "value": round(sum(v for v in times.values() if v), 3),
        "unit": "sec",
        "elapsed_sec": round(time.time() - t_start, 1),
        "queries": times,
        "query_probes": query_probes,
        "runs_per_query": args.runs,
        "sf": args.sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "calibration": {
            "samples": cal,
            # the headline probe is the median over the per-query window
            # readings — the conditions the numbers were actually taken
            # under, not three trajectory snapshots
            "spark_probe_sec": round(_median(probe_readings), 3),
            "cpu_spin_sec": _median([s["cpu_spin_sec"] for s in cal]),
            "probe_band": band,
            "contended": round(_median(probe_readings), 3) > band,
            "n_contended_windows": n_contended,
        },
    }
    out = REPO / f"BENCH_r{args.round:02d}_fullsweep.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out} ({len(times)} queries, total {doc['value']}s, "
          f"{n_contended} contended windows)")


if __name__ == "__main__":
    main()
