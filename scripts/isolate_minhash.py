"""Stage-isolation profile of the minhash pair-set build (guide §1).

dedup_minhash_pairs_build is the largest headline entry (3.98 s of the
19.3 s r12 clean total at sf0.1). This script times each sub-plan with the
noop sink (guide §1.4) under job labels (§1.5), reusing the persisted
intermediates exactly as the real plan does, so the numbers decompose the
real build instead of re-paying upstream work per probe.

Usage: python scripts/isolate_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from onebrc_spark.operators import dedup  # noqa: E402
from onebrc_spark.session import get_spark  # noqa: E402
from onebrc_spark.sources.catalog import load_table, spread  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed(spark, label: str, build) -> None:
    spark.sparkContext.setJobDescription(label)
    runs = []
    for _ in range(REPS):
        runs.append(noop(build()))
    spark.sparkContext.setJobDescription(None)
    print(f"{label:42s} min {min(runs):6.3f}s  runs {[round(r, 3) for r in runs]}")


def main() -> None:
    spark = get_spark("isolate_minhash")
    spark.range(1).count()

    d = spread(load_table(spark, SF_DIR, "documents"), spark)
    slim = dedup._minhash_slim(d)

    # 0. raw scan+spread (the shared corpus subtree)
    timed(spark, "scan+spread(text)", lambda: d)
    # 1. slim: + md5 digest per doc
    timed(spark, "slim(md5 digest)", lambda: slim)
    # 2. census: the one full-corpus shuffle of 40-byte rows
    timed(spark, "dup census (shuffle)", lambda: dedup._dup_census(slim))
    # 3. collapsed rows WITHOUT persist (anti join + shingles)
    dupc = dedup._dup_census(slim).persist()
    dupc.count()
    timed(
        spark,
        "collapsed rows (shingling)",
        lambda: dedup._collapsed_rows(slim, dupc),
    )
    # 4. signature fold only, over a warm collapsed cache
    collapsed = (
        dedup._collapsed_rows(slim, dupc)
        .coalesce(spark.sparkContext.defaultParallelism * 2)
        .persist()
    )
    collapsed.count()
    ws = collapsed.select("doc_id", "ws")
    timed(
        spark,
        "signatures (12-hash fold, warm ws)",
        lambda: ws.select(
            "doc_id", dedup.minhash_signature(F.col("ws")).alias("sig")
        ),
    )
    # 5. banding + occupancy gate + bucket agg + pair explode + distinct
    timed(
        spark,
        "band candidates (warm ws)",
        lambda: dedup.minhash_band_candidates(ws),
    )
    # 6. verification joins (warm ws, fresh candidates each run)
    cand = dedup.minhash_band_candidates(ws).persist()
    cand.count()
    timed(
        spark,
        "verify (warm ws, warm candidates)",
        lambda: dedup.minhash_verify_pairs(ws, cand),
    )
    rep_pairs = dedup.minhash_verify_pairs(ws, cand).persist()
    rep_pairs.count()
    timed(
        spark,
        "expand (warm inputs)",
        lambda: dedup.minhash_expand_pairs(rep_pairs, collapsed),
    )
    for h in (cand, rep_pairs, collapsed, dupc):
        h.unpersist()

    # 7. the full cold build, as the bench times it (count, incl. persist)
    spark.sparkContext.setJobDescription("full cold build (bench shape)")
    runs = []
    for _ in range(REPS):
        dedup.clear_pair_cache()
        t0 = time.time()
        dedup.minhash_pairs(spark, SF_DIR).count()
        runs.append(time.time() - t0)
    print(f"{'FULL cold build+count':42s} min {min(runs):6.3f}s  runs {[round(r, 3) for r in runs]}")
    dedup.clear_pair_cache()


if __name__ == "__main__":
    main()
