#!/usr/bin/env python
"""Multi-executor smoke (VERDICT r8 #7): run the flagship and the memoized
dedup chain under `local-cluster[2,2,2048]` — two SEPARATE executor JVMs —
so the broadcast/persist/memo assumptions the engine makes are executed
across real executor boundaries instead of asserted from local[32] design
notes.

What it proves that local[N] cannot:
  - broadcast joins actually serialize the build side over the wire
    (local mode shares one block manager; here each executor fetches);
  - persisted DataFrames (the MinHash pair memo, the IVF cell assignment)
    are stored as executor-side blocks and the second read is a remote
    cache read, not a driver-local shortcut;
  - Python workers launch on each executor with cloudpickled functions
    (the pandas-UDF query below fails loudly if executor-side Python
    can't rehydrate the plan).

Oracle comparison is the same driver-strict assert_match used everywhere,
at the smoke SF. Runs in ~1-2 min; invoked by the gate-optional
tests/test_local_cluster.py (ONEBRC_LOCAL_CLUSTER=1) and once per round
(result noted in SCALING.md).

Usage: python scripts/local_cluster_smoke.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# 2 executors x 2 cores fits the 2048 MiB/executor budget; the session
# factory's local[*] default is overridden by the explicit master.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

import duckdb  # noqa: E402

from onebrc_spark import registry  # noqa: E402
from onebrc_spark.operators.dedup import minhash_pairs  # noqa: E402
from onebrc_spark.session import get_spark  # noqa: E402
from tests.compare import assert_match  # noqa: E402
from tests.conftest import SMOKE_SF_DIR, TABLE_NAMES  # noqa: E402

# One representative per executed assumption: broadcast dims, the pandas-UDF
# Python-worker path, the flagship agg, the memoized pair-set chain, and
# (r9) the two stateful-streaming queries — the state store partitions by
# key ACROSS executor JVMs here, and the TWS one additionally proves the
# vendored-protobuf PYTHONPATH reaches executor-side Python workers that
# are children of a separate Worker process, not of the driver JVM.
CHECKED = [
    "onebrc_flagship",
    "join_broadcast_dims",
    "udf_grouped_agg_geomean",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "evt_stateful_running_stats",
    "evt_stateful_running_stats_tws",
]


def main() -> int:
    spark = get_spark("onebrc_local_cluster_smoke", master="local-cluster[2,2,2048]")
    assert spark.sparkContext.master.startswith("local-cluster"), (
        spark.sparkContext.master
    )
    # tws_available() is a DRIVER-side answer (set at JVM launch), so it
    # cannot prove worker importability here — the real worker-side check
    # is the evt_stateful_running_stats_tws row in the CHECKED loop below:
    # if executor Python workers can't import protobuf, the query picks
    # the TWS pipeline (driver says available) and the streaming job FAILS
    # on the executors, recorded as that row's FAIL. The print records
    # which API the run exercised.
    from onebrc_spark.streaming.protobuf_compat import tws_available

    print(f"  transformWithState path live: {tws_available()}", flush=True)
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SMOKE_SF_DIR}/{name}.parquet'"
        )
    all_q = registry.load_all()
    failed = []
    for name in CHECKED:
        q = all_q[name]
        t0 = time.time()
        try:
            assert_match(
                q.fn(spark, SMOKE_SF_DIR), con.sql(q.oracle), name=f"{name}[lc]"
            )
            print(f"  {name:32s} MATCH  {time.time() - t0:5.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report every failure, then exit 1
            failed.append(name)
            print(f"  {name:32s} FAIL   {e}", flush=True)
    # memo warm-read across executors: the second pair-set read must be a
    # cache hit (well under the cold build), proving the persisted blocks
    # live on executors and survive between jobs
    t0 = time.time()
    minhash_pairs(spark, SMOKE_SF_DIR).count()
    warm = time.time() - t0
    print(f"  pair-memo warm read: {warm:.2f}s", flush=True)
    if warm > 2.0:
        failed.append("pair_memo_warm_read")
        print("  FAIL: warm pair read too slow — memo not serving from cache")
    spark.stop()
    con.close()
    if failed:
        print(f"local-cluster smoke FAILED: {failed}")
        return 1
    print("local-cluster smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
