"""Gate-optional multi-executor smoke (VERDICT r8 #7).

Runs scripts/local_cluster_smoke.py — flagship + broadcast join + pandas-UDF
+ the memoized dedup chain + both stateful-streaming queries (legacy
applyInPandasWithState and Spark 4 transformWithStateInPandas, the latter
proving vendored-protobuf reaches executor workers) under
`local-cluster[2,2,2048]`, oracle-compared — in a SUBPROCESS, because the
smoke needs its own SparkContext with a different master and the suite's
session-scoped local[N] context cannot coexist with it in one JVM.

Opt-in via ONEBRC_LOCAL_CLUSTER=1 (the run costs ~1-2 min of cluster
startup + executor JVMs; the per-round invocation is recorded in
SCALING.md). Everything the smoke checks is ALSO covered functionally by
the local[N] suites — this test's added value is executing the
broadcast/persist/memo behavior across separate executor JVMs.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(
    os.environ.get("ONEBRC_LOCAL_CLUSTER") != "1",
    reason="multi-executor smoke is opt-in: set ONEBRC_LOCAL_CLUSTER=1",
)
def test_local_cluster_smoke():
    proc = subprocess.run(
        [sys.executable, "-u", str(REPO / "scripts" / "local_cluster_smoke.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"local-cluster smoke failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
    assert "local-cluster smoke OK" in proc.stdout
