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
  - non-finite doubles (NaN, ±Inf) in the events.value measurement column
    are NULL from the engine's point of view — normalized at ingestion on
    BOTH sides (catalog.finite_or_null Spark-side; _normalize_events_refs
    rewrites every oracle's events scan). An embedding vector carrying ANY
    non-finite coordinate nulls out as a WHOLE vector (finite_vector_or_
    null + the embeddings scan rewrite): one NaN poisons every cosine, and
    the similarity family's zero-norm/NULL-cosine guards already drop NULL
    vectors identically in both engines. Raw NaN reaching the repo-wide
    exact-integer quantization idiom THROWS in both engines (ANSI
    CAST_OVERFLOW / DuckDB OutOfRange), and the non-throwing paths disagree
    three ways (SQL sorts NaN greatest, pandas kernels skip it, the driver
    comparator can't equate NaN cells). Corollary: a group whose every
    value is NULL aggregates to NULL stats in both engines, but FORMATTED
    outputs diverge (DuckDB format() → NULL → string_agg skips the line;
    Spark renders a sentinel) — filter all-NULL groups symmetrically
    (onebrc_report's min IS NOT NULL; ST6's value IS NOT NULL);
  - oracle=None marks a genuinely non-SQL-expressible op (driver then runs a
    rows-only check).
"""

from __future__ import annotations

import re
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
    # (b) round-10 semantic changes — same-round proof: sql_recursive_cte
    #     (the recursion's termination bound now rides the recursion as a
    #     carried column instead of a per-level scalar subquery — ~27 fact
    #     scans become 1; VERDICT r9 #7) and evt_stateful_running_stats_tws
    #     (protobuf vendoring made env-overridable + stale-symlink repoint,
    #     VERDICT r9 #5 — execution path, not semantics, but the TWS branch
    #     selection depends on it).
    "sql_recursive_cte",
    "evt_stateful_running_stats_tws",
    # (c) stalest-first (VERDICT r9 #3): ALL 18 rows whose last driver
    #     evidence is round 5 ...
    "sql_tpch_q14_shape",
    "sql_tpch_q15_shape",
    "sql_tpch_q17_shape",
    "sql_tpch_q19_shape",
    "sql_tpch_q22_shape",
    "sql_tpch_q3_shape",
    "sql_tpch_q5_shape",
    "sql_tpch_q6_shape",
    "sql_tpch_q7_shape",
    "sql_tpch_q8_shape",
    "sql_tpch_q9_shape",
    "sql_udf_declared",
    "storage_schema_evolution",
    "text_cooccurrence_lift",
    "text_langid",
    "text_source_overlap",
    "udf_grouped_map_zscore",
    "udf_scalar_sigmoid",
    #     ... and 29 of the 45 round-6 rows. The 16 round-6 rows held
    #     back (slot 51+, first in line for r11) each carry independent
    #     local evidence refreshed this round or pinned by a dedicated
    #     suite: the three ST boundary ops got full engine+oracle+reference
    #     triangle property tests this round (test_boundary_properties),
    #     evt_anomaly_mad/text_repetition_profile/storage_compaction/
    #     text_bpe_merge_pairs/text_boilerplate_clean have named property
    #     suites, cdc_merge_upsert/dedup_incremental_admission/
    #     text_bpe_merge_pairs sit in the per-round bench headline,
    #     onebrc_generated is pinned by the generator property tests, and
    #     the rest are covered by the curation/mlprep parity shards.
    "agg_approx_percentile",
    "agg_corr_covar",
    "agg_equidepth_histogram",
    "agg_rollup",
    "agg_stats",
    "agg_table_fingerprint",
    "cdc_snapshot_diff",
    "dedup_embedding_neardup",
    "dedup_ngram_jaccard",
    "dedup_overlap_containment",
    "evt_dedup_by_id",
    "evt_session_window",
    "filter_predicates",
    "fn_json",
    "fn_map_roundtrip",
    "fn_try_arithmetic",
    "fn_url_parse",
    "fn_variant_json",
    "join_asof",
    "ml_domain_cap",
    "ml_token_budget",
    "onebrc_report",
    "setop_except",
    "sim_knn_bruteforce",
    "sort_multi_key",
    "storage_bucketed_join",
    "storage_csv_roundtrip",
    "text_fingerprint",
    "window_running_frames",
    # ---- slot 51+ (driver verifies the FIRST 50) — remainder ordered
    # stalest-first (last driver-green round ascending), pre-ordering the
    # r11 rotation; every row stays pinned locally by
    # tests/test_oracle_parity.py and the freeze gate at sf0.01/sf0.1. ----
    "cdc_merge_upsert",
    "dedup_incremental_admission",
    "dq_k_anonymity",
    "dq_key_skew_profile",
    "evt_anomaly_mad",
    "evt_sliding_window",
    "evt_tumbling_window",
    "evt_watermark_late_drop",
    "ml_curation_pipeline",
    "ml_quality_upsample",
    "onebrc_generated",
    "sim_semantic_prune",
    "storage_compaction",
    "text_boilerplate_clean",
    "text_bpe_merge_pairs",
    "text_repetition_profile",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_min_by_max_by",
    "agg_sum_count",
    "dedup_keep_first",
    "filter_null_semantics",
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
    "ml_shard_binpack",
    "mm_decode_real",
    "mm_decode_stats",
    "mm_feature_extract",
    "mm_resize",
    "project_prune",
    "setop_except_all",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_all",
    "sim_label_centroid",
    "sort_global_dense_ids",
    "sql_exists_correlated",
    "storage_partitioned_pruning",
    "text_boilerplate_segments",
    "text_ngram_tf",
    "text_tfidf_top_terms",
    "text_token_count_bpe",
    "topk_limit",
    "udf_grouped_agg_geomean",
    "unpivot_stack",
    "window_distribution",
    "window_first_last_nth",
    "window_range_frame",
    "window_ranking",
    "agg_approx_count_distinct",
    "agg_bitmap_distinct",
    "agg_collect_sorted_list",
    "agg_hll_sketch_merge",
    "agg_partial_reaggregation",
    "agg_rank_correlation",
    "agg_salted_twophase",
    "agg_tpch_q1",
    "dedup_exact_distinct",
    "dq_constraint_audit",
    "dq_observe_metrics",
    "evt_gap_fill_lerp",
    "evt_gap_fill_locf",
    "evt_retention_cohorts",
    "evt_transition_matrix",
    "join_asof_forward",
    "join_salted_skew",
    "ml_contamination_ngram",
    "ml_fixed_size_sample",
    "ml_quantile_filter",
    "ml_sequence_packing",
    "ml_stratified_sample",
    "mm_byte_stats_arrow",
    "sim_lsh_candidate_stats",
    "sql_lateral_topn",
    "sql_tpch_q13_shape",
    "sql_tpch_q18_shape",
    "sql_tpch_q4_shape",
    "src_python_datasource",
    "storage_json_roundtrip",
    "storage_orc_roundtrip",
    "storage_zorder_layout",
    "text_fuzzy_levenshtein",
    "text_inverted_index",
    "text_pii_redaction",
    "text_quality_score",
    "text_repetition_score",
    "text_stopword_removal",
    "udtf_chunk_documents",
    "agg_cms_heavy_hitters",
    "cdc_scd2_history",
    "dedup_cluster_best_survivor",
    "dedup_cluster_components",
    "dedup_cluster_survivors",
    "dedup_exact",
    "dedup_graph_pagerank",
    "dedup_minhash_lsh",
    "dedup_minhash_recall_audit",
    "dedup_simhash",
    "dq_column_profile",
    "dq_snapshot_drift",
    "evt_funnel",
    "evt_stateful_running_stats",
    "fn_collation_ci",
    "fn_date_scaffold",
    "join_broadcast_dims",
    "join_inner_fact",
    "join_left_outer",
    "join_range_interval",
    "join_semi_anti",
    "ml_cluster_safe_split",
    "ml_deterministic_shard",
    "ml_hash_split",
    "ml_source_mix",
    "ml_temperature_mix",
    "mm_frame_sample",
    "onebrc_permissive_quarantine",
    "pivot_status_matrix",
    "sim_ann_ivf",
    "sim_ann_ivf_sampled",
    "sim_ann_lsh",
    "sim_ann_lsh_banded",
    "sim_ann_recall_audit",
    "sim_embedding_quantize",
    "sql_agg_filter_clause",
    "sql_tpch_q10_shape",
    "sql_tpch_q11_shape",
    "sql_tpch_q12_shape",
    "sql_tpch_q16_shape",
    "sql_tpch_q20_shape",
    "sql_tpch_q21_shape",
    "sql_tpch_q2_shape",
    "text_token_stats",
    "text_unigram_rarity",
    "window_lag_lead",
    "window_topn_per_group",
]


# Non-finite measurement boundary (the NaN/Inf divergence class): the Spark
# catalog maps NaN/±Inf in events.value to NULL at ingestion
# (sources/catalog.py finite_or_null — one NaN record must degrade to a
# missing value, not CAST_OVERFLOW-kill a 100 TB job). The oracles must see
# the IDENTICAL boundary, so every `FROM/JOIN events` reference in an oracle
# is rewritten at registration to scan through the same normalization —
# DuckDB's `SELECT * REPLACE` keeps the rewrite schema-stable. On NaN-free
# data the CASE is the identity, so every existing oracle hash is unchanged;
# the NaN/Inf fixture rows in tests/test_edge_documents.py pin the class.
_EVENTS_NORM_SCAN = (
    "(SELECT * REPLACE (CASE WHEN isnan(value) OR isinf(value) THEN NULL "
    "ELSE value END AS value) FROM events)"
)
# embeddings twin (catalog.finite_vector_or_null): a vector with ANY
# non-finite coordinate nulls out entirely — the NULL-cosine guards the
# similarity family already carries then drop it consistently on both sides.
_EMBEDDINGS_NORM_SCAN = (
    "(SELECT * REPLACE (CASE WHEN len(list_filter(embedding, "
    "x -> isnan(x) OR isinf(x))) > 0 THEN NULL ELSE embedding END "
    "AS embedding) FROM embeddings)"
)
# words that can follow `events` without being an alias (clause/join
# keywords of the oracle grammar — ADVICE r8 added the join forms DuckDB
# could legally put after a bare scan: ASOF/SEMI/ANTI/NATURAL/POSITIONAL
# joins, TABLESAMPLE, and the set operators)
_SQL_NONALIAS = {
    "group", "where", "order", "window", "on", "join", "left", "right",
    "inner", "cross", "full", "union", "limit", "having", "qualify",
    "using", "when", "and", "or", "as",
    "asof", "semi", "anti", "natural", "positional", "lateral",
    "tablesample", "except", "intersect",
}
def _norm_table_ref(sql: str, table: str, scan: str) -> str:
    """Rewrite every `FROM/JOIN <table> [alias]` to scan the non-finite-
    normalized subquery, preserving an explicit alias when present and
    aliasing back to the table name otherwise. Case-insensitive (ADVICE
    r8): a lowercase `from events` must not silently skip normalization."""
    ref = re.compile(
        rf"\b(FROM|JOIN)(\s+){table}\b(\s+([A-Za-z_]\w*))?", re.IGNORECASE
    )

    def repl(m: re.Match) -> str:
        kw, ws, alias = m.group(1), m.group(2), m.group(4)
        if alias and alias.lower() not in _SQL_NONALIAS:
            return f"{kw}{ws}{scan} {alias}"
        tail = m.group(3) or ""
        return f"{kw}{ws}{scan} {table}{tail}"

    return ref.sub(repl, sql)


def _assert_fully_normalized(sql: str, table: str, scan: str, name: str) -> None:
    """Registration-time tripwire (ADVICE r8): after the rewrite, no bare
    `FROM/JOIN <table>` reference may remain outside the normalized scan
    text itself — a miss means a query would silently compare against
    un-normalized non-finite values (divergence surfaces only when that
    oracle meets a NaN fixture, i.e. far from the edit that broke it)."""
    residue = sql.replace(scan, "<NORMSCAN>")
    if re.search(rf"\b(FROM|JOIN)\s+{table}\b", residue, re.IGNORECASE):
        raise ValueError(
            f"oracle for {name!r}: a bare `{table}` table reference survived "
            f"non-finite normalization — extend _SQL_NONALIAS / fix "
            f"_norm_table_ref"
        )


def _normalize_events_refs(sql: str, name: str = "<oracle>") -> str:
    sql = _norm_table_ref(sql, "events", _EVENTS_NORM_SCAN)
    sql = _norm_table_ref(sql, "embeddings", _EMBEDDINGS_NORM_SCAN)
    _assert_fully_normalized(sql, "events", _EVENTS_NORM_SCAN, name)
    _assert_fully_normalized(sql, "embeddings", _EMBEDDINGS_NORM_SCAN, name)
    return sql


def query(name: str, oracle: str | None, survey_ref: str) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register fn as queries()[name] with its oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        normalized = _normalize_events_refs(oracle, name) if oracle else oracle
        _REGISTRY[name] = Query(name, fn, normalized, survey_ref)
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
