#!/usr/bin/env python
"""Low-core/high-core pair at the 100x scale point (VERDICT r13 #7).

The sf0.1 headline scaling block is fixed-cost dominated by construction
(every entry is sub-3 s at ~600 K rows), so its 8-vs-32-core ratios are all
≈1 and say nothing about whether the heavy dedup shapes PARALLELIZE. This
script measures that directly where the data is big enough to matter: the
existing 100x documents corpus (500 K docs, ~270 MB of text —
scripts/docs_scale_run.py's content-addressed fixture), timing the two
heaviest graded shapes (the MinHash pair build and the containment join) at
the CPU count given by SPARK_GRAFT_CPUS.

Run it once per core count (fresh process per point — the core count is a
session property), then merge with --merge:

    SPARK_GRAFT_CPUS=8  python scripts/core_scaling_100x.py > /tmp/cs8.json
    SPARK_GRAFT_CPUS=32 python scripts/core_scaling_100x.py > /tmp/cs32.json
    python scripts/core_scaling_100x.py --merge /tmp/cs8.json /tmp/cs32.json

--merge writes the pair (and the speedup ratios) into SCALE_DOCS.json under
"core_scaling_100x". Protocol per (query, core count): corpora reused via
the fingerprint marker, one untimed warm run, then min-of-3 timed runs with
the same memo-clearing (cold-build) accounting as docs_scale_run.time_query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

QUERIES = ["dedup_minhash_lsh", "dedup_overlap_containment"]


def measure() -> None:
    from docs_scale_run import build_corpora  # noqa: E402
    from onebrc_spark import registry  # noqa: E402
    from onebrc_spark.operators.clustering import clear_components_cache  # noqa: E402
    from onebrc_spark.operators.dedup import clear_pair_cache  # noqa: E402
    from onebrc_spark.session import get_spark  # noqa: E402

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("core_scaling_100x")
    spark.range(1).count()
    _, _, hundred = build_corpora(spark, "/root/testdata/sf0.1")
    out = {"cpus": cpus, "queries": {}}
    all_q = registry.load_all()
    for name in QUERIES:
        fn = all_q[name].fn

        def clears():
            clear_pair_cache()
            clear_components_cache()

        clears()
        rows = fn(spark, str(hundred)).count()  # codegen warm, untimed
        runs = []
        for _ in range(3):
            clears()
            t0 = time.time()
            fn(spark, str(hundred)).count()
            runs.append(round(time.time() - t0, 3))
        out["queries"][name] = {
            "sec": min(runs),
            "runs": runs,
            "result_rows": rows,
        }
        print(f"# {name} @100x cpus={cpus}: min {min(runs)}s {runs}",
              file=sys.stderr)
    print(json.dumps(out))


def merge(paths: list[str]) -> None:
    points = [json.loads(Path(p).read_text().strip().splitlines()[-1]) for p in paths]
    points.sort(key=lambda d: d["cpus"])
    lo, hi = points[0], points[-1]
    assert lo["cpus"] < hi["cpus"], "need two distinct core counts"
    block = {"cpus_low": lo["cpus"], "cpus_high": hi["cpus"], "queries": {}}
    for name in QUERIES:
        a, b = lo["queries"][name], hi["queries"][name]
        assert a["result_rows"] == b["result_rows"], (name, a, b)
        block["queries"][name] = {
            f"sec_c{lo['cpus']}": a["sec"],
            f"sec_c{hi['cpus']}": b["sec"],
            "runs_low": a["runs"],
            "runs_high": b["runs"],
            "result_rows": a["result_rows"],
            # wall(low cores) / wall(high cores): k means the extra cores
            # bought a k-x speedup (core ratio = perfect scaling)
            "speedup_high_over_low": round(a["sec"] / b["sec"], 3),
        }
    doc_path = REPO / "SCALE_DOCS.json"
    doc = json.loads(doc_path.read_text())
    doc["core_scaling_100x"] = block
    doc_path.write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(block, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--merge":
        merge(sys.argv[2:])
    else:
        measure()
