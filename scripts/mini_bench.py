"""Targeted headline-entry timing, bench.py-shaped (warm plan, best-of-N).

Times only the named HEADLINE entries using the same accounting as bench.py
(pair-cache clear for the build entry, warm pair asset for consumers) so
A/B results are comparable to BENCH artifacts without paying the full run.

Usage: python scripts/mini_bench.py name1 name2 ... [--reps N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from onebrc_spark import registry  # noqa: E402
from onebrc_spark.operators.clustering import clear_components_cache  # noqa: E402
from onebrc_spark.operators.dedup import clear_pair_cache, minhash_pairs  # noqa: E402
from onebrc_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    spark = get_spark("mini_bench")
    spark.range(1).count()
    all_q = registry.load_all()

    def fn_for(name):
        if name == "dedup_minhash_pairs_build":
            return lambda s, d: minhash_pairs(s, d)
        return all_q[name].fn

    for name in args:
        fn = fn_for(name)
        fn(spark, WARM_DIR).count()  # plan warm
        fn(spark, SF_DIR).count()  # first-touch warm at the measured SF
        runs = []
        for _ in range(reps):
            if name == "dedup_minhash_pairs_build":
                clear_pair_cache()
                clear_components_cache()
            elif name == "dedup_cluster_components":
                clear_components_cache()
            t0 = time.time()
            fn(spark, SF_DIR).count()
            runs.append(time.time() - t0)
        print(
            f"{name:35s} min {min(runs):6.3f}  runs {[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
