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

# Driver-coverage rotation (round 7): the correctness driver verifies the
# FIRST 50 registry entries per round. Every query has ≥1 driver-green row
# across rounds, so the window is staleness-driven (VERDICT r6 #2: rotate
# the oldest-evidence third in): after the flagship pin and the twelve
# rows that are NEW or whose code/oracle changed this round, the window is
# exactly the queries with the OLDEST driver evidence — all 28 round-1
# rows and 9 of the 16 remaining round-2 rows (window median last-green
# age drops from ~3 rounds to 1). Slot 51+ holds the remainder oldest-first
# (each entry's last driver-green round annotated), pre-ordering the r8
# rotation. Every query not in the window stays pinned locally by
# tests/test_oracle_parity.py, which runs the same oracle comparison (plus
# a driver-strict canonicalizer) over ALL queries, and by the freeze gate
# (sf0.01 per-commit, sf0.1 end-of-round).
_PRIORITY = [
    # (a) pinned every round: the flagship (also the entry() smoke)
    "onebrc_flagship",
    # (b) round-7 semantic changes / NEW queries — same-round proof:
    #     evt_stateful_running_stats (NEW — ST6 gains a full oracle),
    #     ml_shard_binpack (NEW — size-balanced serpentine sharding),
    #     dedup_graph_pagerank (NEW — exact-integer centrality over the
    #     near-dup graph),
    #     sort_global_dense_ids (refactored onto the shared
    #     global_row_number helper the new op consumes),
    #     text_boilerplate_segments (single-traversal localCheckpoint),
    #     text_tfidf_top_terms (NULL-source df semantics, oracle+code),
    #     mm_* kernels (NULL-payload propagation),
    #     dedup_minhash_lsh / dedup_cluster_components (bounded LRU memos)
    "evt_stateful_running_stats",
    "ml_shard_binpack",
    "dedup_graph_pagerank",
    "sort_global_dense_ids",
    "text_boilerplate_segments",
    "text_tfidf_top_terms",
    "mm_decode_real",
    "mm_decode_stats",
    "mm_feature_extract",
    "mm_resize",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    # (c) the 28 queries whose last driver evidence is ROUND 1 — the
    #     oldest code-vs-evidence gaps in the registry (VERDICT r6 #2)
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_min_by_max_by",
    "agg_sum_count",
    "fn_array_basics",
    "fn_array_higher_order",
    "fn_bitwise",
    "fn_conditional",
    "fn_datetime",
    "fn_hash_digests",
    "fn_math",
    "fn_regexp",
    "fn_strings",
    "join_cross",
    "join_full_outer",
    "join_theta_nonequi",
    "project_prune",
    "setop_except_all",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_all",
    "topk_limit",
    "window_distribution",
    "window_first_last_nth",
    "window_range_frame",
    "window_ranking",
    # (d) 9 of the 16 remaining ROUND-2-evidence rows (the other seven
    #     defer to slot 51+ — each family keeps an in-window
    #     representative: dedup_exact_distinct via dedup_keep_first,
    #     text_fuzzy_levenshtein and text_quality_score via text_ngram_tf
    #     + text_token_count_bpe, storage_json_roundtrip via
    #     storage_partitioned_pruning, agg_collect_sorted_list and
    #     agg_salted_twophase via the six r1 agg rows, join_salted_skew
    #     via the three r1 join rows)
    "dedup_keep_first",
    "filter_null_semantics",
    "sim_label_centroid",
    "sql_exists_correlated",
    "storage_partitioned_pruning",
    "text_ngram_tf",
    "text_token_count_bpe",
    "udf_grouped_agg_geomean",
    "unpivot_stack",
    # ---- slot 51+ (driver verifies the FIRST 50) — remainder ordered
    # by driver-evidence staleness, pre-ordered for the r8 rotation;
    # every row stays pinned locally by tests/test_oracle_parity.py
    # and the freeze gate at sf0.01/sf0.1. ----
    # displaced by the three round-7 NEW rows (families keep in-window
    # representatives — see the (d) note above); all locally green
    "agg_salted_twophase",  # r2
    "join_salted_skew",  # r2
    "text_quality_score",  # r2
    "agg_collect_sorted_list",  # r2
    "dedup_exact_distinct",  # r2
    "storage_json_roundtrip",  # r2
    "text_fuzzy_levenshtein",  # r2
    "agg_bitmap_distinct",  # r3
    "agg_hll_sketch_merge",  # r3
    "agg_partial_reaggregation",  # r3
    "agg_rank_correlation",  # r3
    "dq_constraint_audit",  # r3
    "dq_observe_metrics",  # r3
    "evt_gap_fill_lerp",  # r3
    "evt_gap_fill_locf",  # r3
    "evt_retention_cohorts",  # r3
    "evt_transition_matrix",  # r3
    "join_asof_forward",  # r3
    "ml_contamination_ngram",  # r3
    "ml_fixed_size_sample",  # r3
    "ml_quantile_filter",  # r3
    "ml_sequence_packing",  # r3
    "ml_stratified_sample",  # r3
    "mm_byte_stats_arrow",  # r3
    "sim_lsh_candidate_stats",  # r3
    "sql_lateral_topn",  # r3
    "sql_tpch_q13_shape",  # r3
    "sql_tpch_q18_shape",  # r3
    "sql_tpch_q4_shape",  # r3
    "src_python_datasource",  # r3
    "storage_orc_roundtrip",  # r3
    "storage_zorder_layout",  # r3
    "text_inverted_index",  # r3
    "text_pii_redaction",  # r3
    "text_repetition_score",  # r3
    "text_stopword_removal",  # r3
    "udtf_chunk_documents",  # r3
    "agg_approx_count_distinct",  # r4
    "agg_tpch_q1",  # r4
    "dedup_cluster_survivors",  # r4
    "dedup_exact",  # r4
    "dedup_simhash",  # r4
    "fn_collation_ci",  # r4
    "join_broadcast_dims",  # r4
    "join_inner_fact",  # r4
    "join_range_interval",  # r4
    "join_semi_anti",  # r4
    "ml_cluster_safe_split",  # r4
    "ml_deterministic_shard",  # r4
    "mm_frame_sample",  # r4
    "sim_ann_ivf",  # r4
    "sim_ann_lsh",  # r4
    "sim_ann_lsh_banded",  # r4
    "sim_embedding_quantize",  # r4
    "sql_tpch_q12_shape",  # r4
    "sql_tpch_q16_shape",  # r4
    "sql_tpch_q20_shape",  # r4
    "sql_tpch_q21_shape",  # r4
    "sql_tpch_q2_shape",  # r4
    "text_token_stats",  # r4
    "text_unigram_rarity",  # r4
    "window_lag_lead",  # r4
    "window_topn_per_group",  # r4
    "agg_cms_heavy_hitters",  # r5
    "cdc_scd2_history",  # r5
    "dedup_cluster_best_survivor",  # r5
    "dq_column_profile",  # r5
    "dq_snapshot_drift",  # r5
    "evt_funnel",  # r5
    "fn_date_scaffold",  # r5
    "join_left_outer",  # r5
    "ml_hash_split",  # r5
    "ml_source_mix",  # r5
    "ml_temperature_mix",  # r5
    "onebrc_permissive_quarantine",  # r5
    "pivot_status_matrix",  # r5
    "sim_ann_recall_audit",  # r5
    "sql_agg_filter_clause",  # r5
    "sql_recursive_cte",  # r5
    "sql_tpch_q10_shape",  # r5
    "sql_tpch_q11_shape",  # r5
    "sql_tpch_q14_shape",  # r5
    "sql_tpch_q15_shape",  # r5
    "sql_tpch_q17_shape",  # r5
    "sql_tpch_q19_shape",  # r5
    "sql_tpch_q22_shape",  # r5
    "sql_tpch_q3_shape",  # r5
    "sql_tpch_q5_shape",  # r5
    "sql_tpch_q6_shape",  # r5
    "sql_tpch_q7_shape",  # r5
    "sql_tpch_q8_shape",  # r5
    "sql_tpch_q9_shape",  # r5
    "sql_udf_declared",  # r5
    "storage_schema_evolution",  # r5
    "text_cooccurrence_lift",  # r5
    "text_langid",  # r5
    "text_source_overlap",  # r5
    "udf_grouped_map_zscore",  # r5
    "udf_scalar_sigmoid",  # r5
    "agg_approx_percentile",  # r6
    "agg_corr_covar",  # r6
    "agg_equidepth_histogram",  # r6
    "agg_rollup",  # r6
    "agg_stats",  # r6
    "agg_table_fingerprint",  # r6
    "cdc_merge_upsert",  # r6
    "cdc_snapshot_diff",  # r6
    "dedup_embedding_neardup",  # r6
    "dedup_incremental_admission",  # r6
    "dedup_ngram_jaccard",  # r6
    "dedup_overlap_containment",  # r6
    "dq_k_anonymity",  # r6
    "dq_key_skew_profile",  # r6
    "evt_anomaly_mad",  # r6
    "evt_dedup_by_id",  # r6
    "evt_session_window",  # r6
    "evt_sliding_window",  # r6
    "evt_tumbling_window",  # r6
    "evt_watermark_late_drop",  # r6
    "filter_predicates",  # r6
    "fn_json",  # r6
    "fn_map_roundtrip",  # r6
    "fn_try_arithmetic",  # r6
    "fn_url_parse",  # r6
    "fn_variant_json",  # r6
    "join_asof",  # r6
    "ml_curation_pipeline",  # r6
    "ml_domain_cap",  # r6
    "ml_quality_upsample",  # r6
    "ml_token_budget",  # r6
    "onebrc_generated",  # r6
    "onebrc_report",  # r6
    "setop_except",  # r6
    "sim_ann_ivf_trained",  # r6
    "sim_knn_bruteforce",  # r6
    "sim_semantic_prune",  # r6
    "sort_multi_key",  # r6
    "storage_bucketed_join",  # r6
    "storage_compaction",  # r6
    "storage_csv_roundtrip",  # r6
    "text_boilerplate_clean",  # r6
    "text_bpe_merge_pairs",  # r6
    "text_fingerprint",  # r6
    "text_repetition_profile",  # r6
    "window_running_frames",  # r6
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
