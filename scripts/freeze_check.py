#!/usr/bin/env python
"""Mechanical freeze gate (VERDICT r5 item 2).

Rounds 2 and 5 each lost a driver row to the same process defect: a
semantic edit under onebrc_spark/ landed AFTER the last oracle-parity run
(round 5: the snapshot commit itself changed format_report's sort while the
oracle still ordered by line). This script makes the freeze mechanical:

  python scripts/freeze_check.py          # run the gate, record green
  python scripts/freeze_check.py --check  # fast: is the current tree green?

The gate runs the full local parity suite (every registered query vs its
DuckDB oracle, driver-strict canonicalizer) plus the schema/ordering lints,
and on success appends a `parity_green` record with the hash of the STAGED
index state of onebrc_spark/ + __spark_entry__.py to PROGRESS.jsonl (round
7, ADVICE r6: the hash binds to exactly what a commit would record — stage
first, then run the gate). The pre-commit hook (scripts/hooks/pre-commit,
installed by scripts/install_hooks.sh) refuses any commit whose staged diff
touches onebrc_spark/ while the staged hash has no matching green record —
so query semantics can never again change unverified, least of all in the
end-of-round snapshot.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PROGRESS = REPO / "PROGRESS.jsonl"
GATE_TESTS = [
    "tests/test_oracle_parity.py",
    "tests/test_schema_lint.py",
    # round-6 additions: adversarial-fixture differential suites — the
    # degenerate/edge classes the sf* fixtures never execute
    "tests/test_degenerate_groups.py",
    "tests/test_edge_documents.py",
    # registry-wide shuffle-regression tripwire (~45 s; builds every
    # query — storage ops execute their /tmp writes at build time)
    "tests/test_plan_census.py",
    # constant-factor regression tripwire over the two newest fullsweep
    # artifacts (promoted round 8 after the r7↔r8 pair showed zero false
    # positives; ~1 s — pure JSON comparison, no Spark)
    "tests/test_bench_fullsweep.py",
]


def tree_hash() -> str:
    """Content hash of the STAGED (index) state of onebrc_spark/ plus the
    entry module — the exact bytes a commit would record (ADVICE r6: the
    old working-tree hash let `git add -p` commit a tree that was never
    verified, and untracked scratch files spuriously invalidated a
    verified one). Workflow: `git add` the semantic edits FIRST, then run
    the gate — the green record binds to exactly what gets committed; any
    later index change (partial staging, new edits) changes the hash and
    the pre-commit hook blocks until a fresh green run."""
    out = subprocess.run(
        ["git", "ls-files", "-s", "--", "onebrc_spark", "__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # each line: "<mode> <blob-sha> <stage>\t<path>" — the blob sha IS the
    # content hash, so hashing the sorted listing binds mode+content+path
    h = hashlib.sha256()
    for line in sorted(out.splitlines()):
        h.update(line.encode())
        h.update(b"\0")
    return h.hexdigest()[:16]


def _unstaged_changes() -> str:
    """Unstaged / untracked paths under the protected surface. The gate's
    pytest run executes the WORKING TREE while the green record binds to
    the INDEX — any difference between them means the verified bytes and
    the recorded bytes diverge, so record mode must refuse to proceed
    (a warning would reopen the git-add-p hole in mirror image: staged A,
    edited-to B, tests pass on B, green recorded for A)."""
    # check=True (ADVICE r7): a failed git probe must refuse to record —
    # returning empty on error would silently reopen the verify-vs-record
    # gap this function exists to close (fail-open in mirror image).
    diff = subprocess.run(
        ["git", "diff", "--name-only", "--", "onebrc_spark", "__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard", "--",
         "onebrc_spark", "__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    return "\n  ".join(filter(None, [diff, untracked]))


def last_green() -> str | None:
    if not PROGRESS.exists():
        return None
    green = None
    with PROGRESS.open() as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("event") == "parity_green":
                green = rec.get("tree_hash")
    return green


def main() -> int:
    current = tree_hash()
    if "--check" in sys.argv:
        if last_green() == current:
            print(f"freeze_check: tree {current} has a green parity record")
            return 0
        print(
            f"freeze_check: tree {current} has NO green parity record — "
            "run `python scripts/freeze_check.py` before committing "
            "onebrc_spark/ changes",
            file=sys.stderr,
        )
        return 1

    stray = _unstaged_changes()
    if stray:
        print(
            "freeze_check: REFUSING to run — unstaged/untracked changes "
            "under the protected surface mean the tests would verify the "
            "working tree while the green record binds to the index. "
            f"`git add` these first:\n  {stray}",
            file=sys.stderr,
        )
        return 1

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *GATE_TESTS, "-q"],
        cwd=REPO,
        env={**os.environ},
    )
    if proc.returncode != 0:
        print("freeze_check: parity gate FAILED — not recording green",
              file=sys.stderr)
        return proc.returncode
    rec = {
        "event": "parity_green",
        "tree_hash": current,
        "sf_dir": os.environ.get("ONEBRC_TEST_SF_DIR", "/root/testdata/sf0.01"),
        "elapsed_sec": round(time.time() - t0, 1),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with PROGRESS.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"freeze_check: GREEN — recorded tree {current} in PROGRESS.jsonl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
