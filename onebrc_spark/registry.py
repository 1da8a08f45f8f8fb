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
    "onebrc_spark.operators.cdc",
    "onebrc_spark.sources.pysource",
]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL twin; None → rows-only check
    survey_ref: str  # SURVEY §2 row id(s), e.g. "A1-A7,O1"


_REGISTRY: dict[str, Query] = {}

# Driver-coverage rotation (round 2): the correctness driver verifies the
# FIRST 50 registry entries per round. Round 1 covered build order 0-49, so
# this list front-loads (a) the two round-1 red rows after their fixes
# (filter_null_semantics hash mismatch, agg_collect_sorted_list canonicalizer
# crash) and (b) the 47 queries the round-1 gate never reached (event-time,
# dedup, similarity, text, multimodal, UDF, SQL-surface, storage, skew,
# ml-prep, fn_json/fn_date_scaffold), then the flagship as slot 50. The 46
# round-1-green queries stay pinned locally by tests/test_oracle_parity.py,
# which runs the same oracle comparison (plus a driver-strict canonicalizer)
# over ALL queries regardless of this ordering.
_PRIORITY = [
    "filter_null_semantics",
    "agg_collect_sorted_list",
    "fn_json",
    "fn_date_scaffold",
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_session_window",
    "evt_watermark_late_drop",
    "evt_dedup_by_id",
    "evt_funnel",
    "dedup_exact",
    "dedup_exact_distinct",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_keep_first",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "sim_label_centroid",
    "dedup_embedding_neardup",
    "sim_ann_ivf",
    "text_token_stats",
    "text_token_count_bpe",
    "text_langid",
    "text_quality_score",
    "text_ngram_tf",
    "text_fingerprint",
    "text_fuzzy_levenshtein",
    "mm_decode_stats",
    "mm_frame_sample",
    "mm_feature_extract",
    "mm_resize",
    "udf_scalar_sigmoid",
    "udf_grouped_agg_geomean",
    "udf_grouped_map_zscore",
    "sql_tpch_q3_shape",
    "sql_tpch_q5_shape",
    "sql_exists_correlated",
    "pivot_status_matrix",
    "unpivot_stack",
    "sql_tpch_q6_shape",
    "storage_partitioned_pruning",
    "storage_bucketed_join",
    "storage_csv_roundtrip",
    "storage_json_roundtrip",
    "agg_salted_twophase",
    "join_salted_skew",
    "ml_hash_split",
    "ml_source_mix",
    "onebrc_flagship",
    # Slots 51+: round-2 additions (no driver row yet either) — ahead of the
    # round-1-green queries in case the driver checks more than 50.
    "onebrc_generated",  # upgraded rows-only -> hash-verified oracle
    "dedup_cluster_components",
    "dedup_cluster_survivors",
    "cdc_merge_upsert",
    "cdc_snapshot_diff",
    "evt_retention_cohorts",
    "evt_gap_fill_locf",
    "ml_stratified_sample",
    "ml_temperature_mix",
    "ml_quantile_filter",
    "ml_fixed_size_sample",
    "ml_sequence_packing",
    "ml_contamination_ngram",
    "text_inverted_index",
    "text_repetition_score",
    "text_tfidf_top_terms",
    "text_stopword_removal",
    "sim_lsh_candidate_stats",
    "sim_ann_ivf_trained",
    "sql_recursive_cte",
    "sql_lateral_topn",
    "sql_agg_filter_clause",
    "sql_tpch_q13_shape",
    "sql_tpch_q17_shape",
    "sql_tpch_q18_shape",
    "storage_orc_roundtrip",
    "storage_zorder_layout",
    "fn_variant_json",
    "fn_try_arithmetic",
    "udtf_chunk_documents",
    "agg_partial_reaggregation",
    "agg_hll_sketch_merge",
    "agg_table_fingerprint",
    "fn_map_roundtrip",
    "evt_transition_matrix",
    "agg_equidepth_histogram",
    "agg_rank_correlation",
    "dq_constraint_audit",
    "fn_url_parse",
    "mm_byte_stats_arrow",
    "sql_tpch_q4_shape",
    "sql_tpch_q14_shape",
    "sql_tpch_q19_shape",
    "sql_tpch_q21_shape",
    "sql_tpch_q22_shape",
    "src_python_datasource",
    "sql_udf_declared",
    "dq_observe_metrics",
    "agg_approx_percentile",
    "evt_gap_fill_lerp",
    "text_pii_redaction",
    "agg_bitmap_distinct",
    "join_asof_forward",
    "fn_collation_ci",
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
