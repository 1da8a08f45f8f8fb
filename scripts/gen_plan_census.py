"""Regenerate tests/plan_census.json: per-query physical-exchange census.

Every registered query is built at the smoke SF and its final plan's
Exchange count recorded. tests/test_plan_census.py fails any query whose
count GROWS — the generic shuffle-regression tripwire behind the
hand-written pins in tests/test_plans.py. Run this script (and eyeball the
diff) when a plan change is intentional.

NOTE "built", not "planned-only": most queries cost one Catalyst plan, but
the storage operators execute their /tmp writes at DataFrame-build time
and the iterative ops (connected components, k-means) run their driver
loops — the measured full-census cost is ~45 s at sf0.001.

Usage: python scripts/gen_plan_census.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from onebrc_spark import registry  # noqa: E402
from onebrc_spark.plans import num_exchanges  # noqa: E402
from onebrc_spark.session import get_spark  # noqa: E402
from tests.conftest import SMOKE_SF_DIR  # noqa: E402  (census must match the gate's SF)
OUT = Path(__file__).resolve().parents[1] / "tests" / "plan_census.json"


def main() -> None:
    spark = get_spark()
    census: dict[str, int] = {}
    for name, q in sorted(registry.load_all().items()):
        census[name] = num_exchanges(q.fn(spark, SMOKE_SF_DIR))
        print(f"{name:40s} {census[name]}")
    OUT.write_text(json.dumps(census, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(census)} queries)")


if __name__ == "__main__":
    main()
