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

# Driver-coverage rotation (round 6): the correctness driver verifies the
# FIRST 50 registry entries per round. All 179 queries have ≥1 driver-green
# row across rounds (coverage gap closed in r5), so this round's window is
# pure evidence-refresh, ordered by staleness and semantic change:
# (a) the flagship + the four event-time rows, pinned every round;
# (b) every query whose Spark code or oracle text changed in round 6:
#     onebrc_report (the r5 red — oracle now ORDER BY station),
#     agg_stats / agg_corr_covar (nullif-guarded + decimal-widened
#     denominators), text_fingerprint (empty-doc NULL guard),
#     sim_ann_ivf_trained (pinned-TRUE oracle replaced by measured
#     recall_ppm);
# (c) the 32 queries whose latest driver evidence is ROUND 1 — the round-5
#     exact-ratio sweep touched nearly every module after their last driver
#     row, so these are the longest code-vs-evidence gaps in the registry;
# (d) VERDICT-named stale-SQL rows: storage_csv_roundtrip / evt_dedup_by_id
#     (r2 evidence), cdc_merge_upsert / cdc_snapshot_diff (r3, sweep-changed
#     SQL), join_asof + onebrc_generated (r4 evidence, r5 code changes).
# Slot 51+ holds the r2/r3 remainder oldest-first, ready to rotate in next
# round. Every query not in the window stays pinned locally by
# tests/test_oracle_parity.py, which runs the same oracle comparison (plus
# a driver-strict canonicalizer) over ALL queries.
_PRIORITY = [
    # (a) pinned every round
    "onebrc_flagship",
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_session_window",
    "evt_watermark_late_drop",
    # (b) round-6 semantic changes / NEW queries — need same-round proof
    "onebrc_report",
    "agg_stats",
    "agg_corr_covar",
    "text_fingerprint",
    "sim_ann_ivf_trained",
    "ml_domain_cap",
    "ml_token_budget",
    "ml_quality_upsample",
    "sort_global_dense_ids",
    # (b2) round-6 edge-hardening changes (ANSI-0/0 guards, lenient-JSON
    # oracles, discrete percentile bands) — the other queries whose Spark
    # expression or oracle text changed this round
    "fn_json",
    "fn_variant_json",
    "fn_map_roundtrip",
    "fn_try_arithmetic",
    "fn_url_parse",
    "agg_approx_percentile",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_incremental_admission",
    "dedup_embedding_neardup",
    "sim_knn_bruteforce",
    "sim_semantic_prune",
    # (c) round-1-evidence rows, oldest code-vs-evidence gap (20 of 32 —
    # the other 12 yielded their slots to (b2)'s changed-code rows, chosen
    # as the r1 rows whose operator family keeps another in-window
    # representative; all remain locally green at sf0.01 AND sf0.1)
    "agg_rollup",
    "filter_predicates",
    "setop_except",
    "sort_multi_key",
    # (d) VERDICT-named stale-SQL / code-changed rows
    "storage_csv_roundtrip",
    "evt_dedup_by_id",
    "cdc_merge_upsert",
    "cdc_snapshot_diff",
    "join_asof",
    "onebrc_generated",
    # (e) edge-catalog hardening changes (NULL-semantics fixes late in
    # round 6) — same-round proof; five (c) rows yielded their slots
    # (agg_sum_count, agg_histogram, agg_min_by_max_by, join_full_outer,
    # project_prune — each family keeps an in-window representative and
    # all five are locally green at sf0.01 and sf0.1)
    "agg_table_fingerprint",
    "agg_equidepth_histogram",
    "dq_key_skew_profile",
    "window_running_frames",
    "storage_bucketed_join",
    # (f) NEW ops added late in round 6 — first driver rows beat evidence
    # refreshes (fn_math, topk_limit, setop_union_all, setop_intersect and
    # fn_strings yielded; every displaced family keeps an in-window
    # representative (setop_except and five scalar-fn rows stay) and all
    # are locally green at both SFs)
    "text_repetition_profile",
    "evt_anomaly_mad",
    "dedup_overlap_containment",
    "ml_curation_pipeline",
    "storage_compaction",
    "dq_k_anonymity",
    "text_boilerplate_segments",
    "text_bpe_merge_pairs",
    "text_boilerplate_clean",
    # ---- slot 51+ (driver verifies the FIRST 50 — everything below this
    # marker is outside the round-6 window; r2/r3 remainder oldest-first,
    # pre-ordered for the round-7 rotation). window_ranking and
    # window_range_frame yielded their round-6 slots to the four NEW ops
    # (first driver rows beat evidence refreshes; both are r1-stale but
    # their family has fresher rows and both are locally green at sf0.01
    # and sf0.1). The 12 r1 rows displaced by (b2) lead the remainder. ----
    # round-6 empty-catalog touch-ups (populated-input results unchanged —
    # HAVING/coalesce/spine only bite on empty inputs; re-prove first in r7)
    "agg_count_distinct",
    "fn_hash_digests",
    "fn_datetime",
    "agg_cube",
    "agg_grouping_sets",
    "dq_constraint_audit",
    "sim_lsh_candidate_stats",
    "storage_partitioned_pruning",
    "fn_regexp",
    "fn_math",
    "topk_limit",
    "setop_union_all",
    "setop_intersect",
    "fn_strings",
    "agg_sum_count",
    "agg_histogram",
    "agg_min_by_max_by",
    "join_full_outer",
    "project_prune",
    "window_ranking",
    "window_range_frame",
    "window_distribution",
    "window_first_last_nth",
    "fn_array_basics",
    "fn_array_higher_order",
    "fn_bitwise",
    "fn_conditional",
    "join_cross",
    "join_theta_nonequi",
    "setop_except_all",
    "setop_intersect_all",
    "agg_collect_sorted_list",
    "agg_salted_twophase",
    "dedup_exact_distinct",
    "dedup_keep_first",
    "filter_null_semantics",
    "join_salted_skew",
    "mm_decode_stats",
    "mm_resize",
    "sim_label_centroid",
    "sql_exists_correlated",
    "storage_json_roundtrip",
    "text_fuzzy_levenshtein",
    "text_ngram_tf",
    "text_quality_score",
    "text_token_count_bpe",
    "udf_grouped_agg_geomean",
    "unpivot_stack",
    "agg_bitmap_distinct",
    "agg_hll_sketch_merge",
    "agg_partial_reaggregation",
    "agg_rank_correlation",
    "dq_observe_metrics",
    "evt_gap_fill_lerp",
    "evt_gap_fill_locf",
    "evt_retention_cohorts",
    "evt_transition_matrix",
    "join_asof_forward",
    "ml_contamination_ngram",
    "ml_fixed_size_sample",
    "ml_quantile_filter",
    "ml_sequence_packing",
    "ml_stratified_sample",
    "mm_byte_stats_arrow",
    "sql_lateral_topn",
    "sql_tpch_q13_shape",
    "sql_tpch_q18_shape",
    "sql_tpch_q4_shape",
    "src_python_datasource",
    "storage_orc_roundtrip",
    "storage_zorder_layout",
    "text_inverted_index",
    "text_pii_redaction",
    "text_repetition_score",
    "text_stopword_removal",
    "text_tfidf_top_terms",
    "udtf_chunk_documents",
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
