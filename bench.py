"""Benchmark harness (driver contract): headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is total wall-clock over the headline set (excluding Spark startup),
per-query seconds in `queries`. Each query executes to completion with a
count()-style action (no driver-side result materialization beyond the
aggregate — mirrors how the reference times scan→agg→sort end-to-end,
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from onebrc_spark import registry
from onebrc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship + one representative per operator family,
# weighted toward the shapes that dominate at 100 TB (scan-agg, fact join,
# window, near-dup, similarity).
HEADLINE = [
    "onebrc_flagship",
    "agg_tpch_q1",
    "join_inner_fact",
    "join_broadcast_dims",
    "join_asof",
    "window_topn_per_group",
    "evt_session_window",
    "dedup_minhash_lsh",
    "sim_ann_lsh",
    "text_ngram_tf",
]


def main() -> None:
    spark = get_spark("onebrc_bench")
    all_q = registry.load_all()
    # Warm the session (JVM/codegen) with one tiny action so per-query times
    # measure the queries, not first-touch initialization.
    spark.range(1).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        q = all_q[name]
        t0 = time.time()
        df = q.fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {times[name]}s", file=sys.stderr, flush=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
