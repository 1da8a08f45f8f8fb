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
  - never let a DecimalType reach a Spark-side OUTPUT column: Spark types
    decimal literals (10000.0) as DECIMAL, so BIGINT / 10000.0 is
    decimal(28,7) and renders trailing scale digits ('…6071000') that
    hash-mismatch DuckDB's float64 ('…6071') even when values are equal
    (7 driver reds in round 4). Divide by EXPONENT literals (1e4, 1e2 —
    DOUBLE in both engines) or CAST(... AS DOUBLE) first; enforced by
    tests/test_schema_lint.py (plan sweep) and compare.py (hard error);
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
  - the same applies to EXACT-INTEGER RATIOS (round-5 audit): once the
    numerator is an exact integer, sum/count/scale is the identical double
    in both engines — emit it UNROUNDED. A final round(·, d) re-creates
    the divergence whenever the exact ratio terminates in a 5 at digit
    d+1 (confirmed live: 240918/48/100 → Spark 50.1913, DuckDB 50.1912);
    likewise statistical moments (var/corr/covar/slope) are composed from
    integer moment sums in decimal(38,0)/HUGEINT, divided once, unrounded;
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

# Driver-coverage rotation (round 5): the correctness driver verifies the
# FIRST 50 registry entries per round. In-window this round:
# (a) the flagship + the four event-time rows, pinned every round;
# (b) the 10 round-4 queries that have never had ANY driver row
#     (VERDICT r4 §4 — implemented + locally green, zero driver evidence);
# (c) the 15 DECIMAL-rendering fixes (VERDICT r4 §1): the 7 hash-red rows
#     from CORRECTNESS_r04 plus the 8 latent same-class queries, all now
#     emitting DOUBLE (exponent-literal divisions; enforced by
#     tests/test_schema_lint.py) — changed SQL needs fresh driver proof;
# (d) every other query whose Spark code or oracle text changed in round 5
#     (quantize-to-cents on join_left_outer / fn_date_scaffold, the staged
#     overflow-safe division in ml_temperature_mix, /1e2 literal swaps);
# (e) filler: green rows from the big operator families longest without a
#     re-proof. Every query not in the window stays pinned locally by
# tests/test_oracle_parity.py, which runs the same oracle comparison (plus
# a driver-strict canonicalizer) over ALL queries.
_PRIORITY = [
    # (a) pinned every round
    "onebrc_flagship",
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_session_window",
    "evt_watermark_late_drop",
    # (b) never-driver-sampled round-4 queries — close 176/176 coverage
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
    # (c) DECIMAL-fix re-proofs: the 7 r4 hash-reds ...
    "sql_tpch_q7_shape",
    "sql_tpch_q8_shape",
    "sql_tpch_q9_shape",
    "sql_tpch_q10_shape",
    "sql_tpch_q11_shape",
    "sql_tpch_q15_shape",
    "sql_udf_declared",
    # ... and the 8 latent same-class queries never sampled on DOUBLE output
    "sql_tpch_q3_shape",
    "sql_tpch_q5_shape",
    "sql_tpch_q6_shape",
    "sql_tpch_q14_shape",
    "sql_tpch_q17_shape",
    "sql_tpch_q19_shape",
    "sql_tpch_q22_shape",
    "sql_recursive_cte",
    # (d) round-5 code/oracle changes needing fresh proof
    "join_left_outer",
    "fn_date_scaffold",
    "ml_temperature_mix",
    "pivot_status_matrix",
    "sql_agg_filter_clause",
    "dedup_minhash_lsh",
    # (d2) NEW in round 5 — need their first driver rows
    "sim_ann_recall_audit",
    "cdc_scd2_history",
    "dq_key_skew_profile",
    # (e) filler: longest-unproven green rows across operator families
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
    # ---- slot 51+ (driver verifies the FIRST 50 — everything below this
    # marker is outside the round-5 window; kept in useful order in case
    # the driver checks further) ----
    "cdc_merge_upsert",
    "cdc_snapshot_diff",
    "storage_csv_roundtrip",
    "storage_zorder_layout",
    "agg_hll_sketch_merge",
    "mm_byte_stats_arrow",
    "udtf_chunk_documents",
    "sim_lsh_candidate_stats",
    "window_first_last_nth",
    "window_range_frame",
    "window_distribution",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_stats",
    "agg_corr_covar",
    "join_full_outer",
    "join_cross",
    "join_theta_nonequi",
    "join_asof_forward",
    "setop_union_all",
    "fn_strings",
    "fn_regexp",
    "fn_datetime",
    "fn_math",
    "fn_bitwise",
    "fn_conditional",
    "fn_array_basics",
    "fn_array_higher_order",
    "fn_variant_json",
    "udf_grouped_agg_geomean",
    "evt_dedup_by_id",
    "filter_predicates",
    "filter_null_semantics",
    "sort_multi_key",
    "topk_limit",
    "project_prune",
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
