"""Query catalog: every operator ships as a (query, oracle_sql) pair.

This is the engine's formalization of the reference's implicit test strategy
(SURVEY §5.1): the reference validates by running five implementations of the
same query and comparing; we validate by running the Spark plan and a DuckDB
oracle SQL over identical parquet and hash-comparing (driver t2 gate).

Registration rules (SURVEY §7.4 definition-of-done):
  - alias every computed column identically in Spark and oracle SQL;
  - round float aggregates in-query (both sides) so hashes are stable under
    partition-order float nondeterminism (SURVEY §7.3 #2);
  - never return a raw TimestampType column — cast to DATE / epoch BIGINT /
    string so Spark-driver and DuckDB value representations agree;
  - never return an array/struct-valued column — serialize it (array_join /
    to_json; oracle: string_agg ... ORDER BY) — the driver's pandas
    canonicalizer crashes sorting list cells (unhashable type: 'list');
  - CAST every integer-typed SUM to BIGINT in the oracle SQL — DuckDB
    sum(int) yields HUGEINT, which pandas renders float64 and the driver's
    value hash then diverges from Spark's bigint (tests/compare.py layer 2
    reproduces this class locally);
  - never emit round(sum(x)/count, d)-style RATIO columns over grid-rounded
    inputs — exact rationals land on round-half boundaries (2409.18/48 =
    50.19125) and parallel summation order then tie-breaks differently per
    run/engine; emit the numerator and denominator instead — or compute the
    ratio on EXACT INTEGERS: value/price columns are ≤2-dp grids, so
    sum(CAST(round(x*100) AS BIGINT))/count/100.0 is bit-identical across
    engines at any scale (this fixed three sf0.1 divergences that were
    invisible at sf0.01; the flagship mean uses the integer-arithmetic
    half-away-from-zero form for the same reason);
  - more generally: NEVER let a DOUBLE SUM/AVG over many rows reach the
    result or a comparison — a parallel float sum's low bits depend on
    partition merge order (round-4 audit: a sqrt-weight normalizer flipped
    floor(100·x) by ±1 under load). Quantize each row to an exact integer
    (cents, 1e-4 units for grid products, 1e-9 for genuine per-row ratios)
    BEFORE the sum, divide once after. Exceptions, each justified at the
    site: integral-valued doubles (partial sums exact), transcendental
    per-row values at ≥4-dp rounding with micro-magnitude noise
    (sql_udf_declared sum_sig), off-grid float avgs with ~1e-14 noise vs
    5e-5 boundaries (sim_label_centroid);
  - per-row derived scalars (lerp, parsed fields) stay UNROUNDED: every op
    is correctly rounded on deterministic inputs, so identical expression
    order means identical bits — rounding them is what INTRODUCES
    divergence (Spark string-BigDecimal HALF_UP vs DuckDB binary round
    disagree on x.xxxx5);
  - sketch estimates (HLL, approx_percentile) are engine-specific: the
    oracle pins the EXACT value plus a tolerance-band boolean computed on
    the Spark side — never the estimate itself;
  - window ORDER BY must be a TOTAL order over the partition — synthetic
    keys are not unique ((l_orderkey, l_linenumber) repeats); add the
    aggregated value columns to the sort key or running frames are
    order-ambiguous;
  - every oracle must be NON-VACUOUS at sf0.01: result rows exist, outer/
    anti joins produce unmatched rows, thresholds are calibrated to the
    corpus (sweep: 0-row results, all-NULL columns, constant columns);
  - oracle=None marks a genuinely non-SQL-expressible op (driver then runs a
    rows-only check).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import registers queries. Order is the SURVEY §7.2 build order.
_QUERY_MODULES = [
    "onebrc_spark.operators.aggregates",
    "onebrc_spark.operators.relational",
    "onebrc_spark.operators.joins",
    "onebrc_spark.operators.windows",
    "onebrc_spark.operators.setops",
    "onebrc_spark.functions.scalar",
    "onebrc_spark.functions.arrays_json",
    "onebrc_spark.operators.eventtime",
    "onebrc_spark.operators.dedup",
    "onebrc_spark.operators.clustering",
    "onebrc_spark.operators.similarity",
    "onebrc_spark.operators.textops",
    "onebrc_spark.operators.multimodal",
    "onebrc_spark.operators.udfs",
    "onebrc_spark.operators.sqlsurface",
    "onebrc_spark.operators.storage",
    "onebrc_spark.operators.skew",
    "onebrc_spark.operators.mlprep",
    "onebrc_spark.operators.curation",
    "onebrc_spark.operators.incremental",
    "onebrc_spark.operators.cdc",
    "onebrc_spark.sources.pysource",
    "onebrc_spark.sources.onebrc",
]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL twin; None → rows-only check
    survey_ref: str  # SURVEY §2 row id(s), e.g. "A1-A7,O1"


_REGISTRY: dict[str, Query] = {}

# Driver-coverage rotation (round 4): the correctness driver verifies the
# FIRST 50 registry entries per round. After r3's 50/50-green window, 24
# registered queries remain that have never had a driver-green row on their
# CURRENT oracle (19 never checked + 5 whose only row predates an oracle
# upgrade) — VERDICT.md round-3 task 2 lists them; they are front-loaded
# here so round 4 closes 161/161 cumulative driver coverage. Also in-window:
# (a) the flagship + the four event-time rows, pinned every round, and
# (b) every query whose IMPLEMENTATION changed this round (cluster
# components/survivors, minhash memoization, the q21 single-pass rewrite,
# the banded-LSH headline ANN) — changed code needs fresh driver proof, not
# a stale green row. Every query not in the window stays pinned locally by
# tests/test_oracle_parity.py, which runs the same oracle comparison (plus
# a driver-strict canonicalizer) over ALL queries.
_PRIORITY = [
    # (a) pinned every round
    "onebrc_flagship",
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_session_window",
    "evt_watermark_late_drop",
    # (b) the 24 never-driver-green-on-current-oracle rows (VERDICT r3 §2)
    "dedup_simhash",
    "mm_frame_sample",
    "mm_feature_extract",
    "agg_approx_count_distinct",
    "onebrc_generated",
    "sim_ann_ivf_trained",
    "mm_decode_real",
    "ml_cluster_safe_split",
    "ml_deterministic_shard",
    "sim_embedding_quantize",
    "text_unigram_rarity",
    "agg_table_fingerprint",
    "sql_tpch_q7_shape",
    "sql_tpch_q8_shape",
    "sql_tpch_q9_shape",
    "sql_tpch_q10_shape",
    "sql_tpch_q15_shape",
    "sql_tpch_q20_shape",
    "sql_agg_filter_clause",
    "sql_udf_declared",
    "fn_map_roundtrip",
    "fn_url_parse",
    "fn_collation_ci",
    "fn_try_arithmetic",
    # (c) implementation changed in round 4 — fresh proof required
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_cluster_survivors",
    "sql_tpch_q21_shape",
    "sim_ann_lsh_banded",
    # (d) remaining window: r1-green rows never re-proven since the
    # testdata regenerations — rotate through the big operator families
    "join_asof",
    "join_range_interval",
    "window_lag_lead",
    "agg_tpch_q1",
    "join_inner_fact",
    "join_broadcast_dims",
    "join_semi_anti",
    "window_topn_per_group",
    "dedup_exact",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "text_token_stats",
    # (e) NEW in round 4 — the TPC-H sweep completers (q1-q22 all covered)
    "sql_tpch_q2_shape",
    "sql_tpch_q11_shape",
    "sql_tpch_q12_shape",
    "sql_tpch_q16_shape",
    # ---- slot 51+ (driver may check more than 50; keep useful order) ----
    # NEW in round 4 (post-window additions; front of the overflow so they
    # get rows if the driver checks past 50, else they lead round 5's window)
    "dedup_incremental_admission",
    "dq_snapshot_drift",
    "dedup_cluster_best_survivor",
    "text_source_overlap",
    "sim_semantic_prune",
    "agg_cms_heavy_hitters",
    "storage_schema_evolution",
    "text_cooccurrence_lift",
    "dq_column_profile",
    "onebrc_permissive_quarantine",
    "text_langid",
    "window_running_frames",
    "dedup_ngram_jaccard",
    "sim_knn_bruteforce",
    "udf_scalar_sigmoid",
    "evt_funnel",
    "udf_grouped_map_zscore",
    "fn_json",
    "onebrc_report",
    "ml_hash_split",
    "ml_source_mix",
    "cdc_merge_upsert",
    "cdc_snapshot_diff",
    "storage_csv_roundtrip",
    "storage_zorder_layout",
    "agg_hll_sketch_merge",
    "mm_byte_stats_arrow",
    "udtf_chunk_documents",
    "sim_lsh_candidate_stats",
]


def query(name: str, oracle: str | None, survey_ref: str) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register fn as queries()[name] with its oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, survey_ref)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    missing = set(_PRIORITY) - set(_REGISTRY)
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {sorted(missing)}")
    names = sorted(
        _REGISTRY, key=lambda n: (rank.get(n, len(_PRIORITY)), list(_REGISTRY).index(n))
    )
    return {n: _REGISTRY[n] for n in names}


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in load_all().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in load_all().values() if q.oracle is not None}
