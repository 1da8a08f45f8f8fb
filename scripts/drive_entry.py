"""Drive __spark_entry__.py exactly as the driver does (verification harness).

Fresh SparkSession → entry(spark) smoke → every queries()[name] at sf0.01
side-by-side with oracle_sql()[name] in DuckDB → order-insensitive compare.
Prints one line per query + a summary. Exit 1 on any mismatch/error.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

_args = [a for a in sys.argv[1:] if not a.startswith("-")]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
# --only=name1,name2 restricts to those queries (targeted re-verification).
ONLY = None
for _a in sys.argv[1:]:
    if _a.startswith("--only="):
        ONLY = set(_a.split("=", 1)[1].split(","))

import __spark_entry__ as mod
from onebrc_spark.session import get_spark
from tests.compare import assert_match

spark = get_spark("drive_entry")

# 1. entry() smoke — what the driver's t1 does.
t0 = time.time()
edf = mod.entry(spark)
rows = edf.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in edf.schema.fields]}, "
      f"{time.time()-t0:.1f}s", flush=True)
assert len(rows) > 0

# 2. queries vs oracles — what the driver's t2 does.
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = mod.queries()
oracles = mod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} with oracle", flush=True)
failed = []
checked = 0
for name, fn in sorted(qs.items()):
    if ONLY is not None and name not in ONLY:
        continue
    checked += 1
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        if name in oracles:
            assert_match(sdf, con.sql(oracles[name]), name=name)
            status = "MATCH"
        else:
            n = sdf.count()
            status = f"rows-only n={n}"
            assert n >= 0
    except Exception as e:
        status = f"FAIL {type(e).__name__}: {str(e)[:200]}"
        failed.append(name)
        if "-v" in sys.argv:
            traceback.print_exc()
    print(f"  {name:32s} {status:20s} {time.time()-t0:5.1f}s", flush=True)

# Storage hygiene report (round-3 finding: per-call persists leaking across
# a full drive). Expected steady state: a handful of entries — the memoized
# minhash pair set per sf_dir plus bounded iterative-op checkpoints —
# NOT one shingle cache per dedup query executed.
_storage = spark.sparkContext._jsc.sc().getRDDStorageInfo()
print(f"block-manager storage after drive: {len(_storage)} persisted RDDs")

print(f"\n{checked - len(failed)}/{checked} OK; failed: {failed}")
sys.exit(1 if failed else 0)
