"""Dump `.explain("formatted")` for registered queries to plans/r13/.

Optimization-round deliverable (guide §7.2): the judge checks plan-shape
claims (Exchange counts, join strategies, PushedFilters, BatchEvalPython
nodes) against these files, so every query touched in the round commits a
`<name>_before.txt` / `<name>_after.txt` pair.

Usage:
  python scripts/dump_plans.py before              # all queries -> plans/r13/<name>_before.txt
  python scripts/dump_plans.py after q1 q2 ...     # named queries -> plans/r13/<name>_after.txt
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from onebrc_spark import registry  # noqa: E402
from onebrc_spark.session import get_spark  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "plans" / os.environ.get(
    "PLANS_ROUND", "r14"
)
SF_DIR = "/root/testdata/sf0.01"


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_dump")
    all_q = registry.load_all()
    targets = names or list(all_q)
    for name in targets:
        q = all_q[name]
        try:
            df = q.fn(spark, SF_DIR)
            text = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 — record, don't abort the dump
            text = f"PLAN BUILD FAILED: {type(e).__name__}: {e}\n"
        (OUT / f"{name}_{suffix}.txt").write_text(text)
        print(f"{name}: {len(text)} bytes")


if __name__ == "__main__":
    main()
