"""Adversarial documents fixture: every documents-only query vs its oracle.

The sf* fixtures are clean prose — no empty documents, no double spaces, no
unicode, no single-token docs — so whole classes of latent cross-engine
divergence (ascii('') vs ord(''), element_at on empty arrays, shingle
windows shorter than n, 0/0 ratios) never execute. Round-5's advice found
two such bugs by code reading; this suite EXECUTES the class: a purpose-
built corpus of degenerate/edge documents, every registered query whose
oracle touches only the documents table, full driver-strict comparison.

Any failure here is a real latent bug against a plausible future fixture
regeneration (the driver regenerates testdata; nothing guarantees clean
prose forever) — fix the operator, don't relax the test.
"""

from __future__ import annotations

import duckdb
import pytest

from onebrc_spark import registry
from tests.compare import assert_match

ALL = registry.load_all()

# Every registered query whose oracle reads ONLY the documents table
# (mechanically derived; update when adding documents-only queries).
DOC_ONLY = [
    "agg_cms_heavy_hitters",
    "dedup_cluster_best_survivor",
    "dedup_cluster_components",
    "dedup_cluster_survivors",
    "dedup_exact",
    "dedup_exact_distinct",
    "dedup_graph_pagerank",
    "dedup_incremental_admission",
    "dedup_keep_first",
    "dedup_minhash_lsh",
    "dedup_minhash_recall_audit",
    "dedup_ngram_jaccard",
    "dedup_overlap_containment",
    "dedup_simhash",
    "dq_k_anonymity",
    "fn_hash_digests",
    "fn_regexp",
    "ml_cluster_safe_split",
    "ml_contamination_ngram",
    "ml_curation_pipeline",
    "ml_deterministic_shard",
    "ml_domain_cap",
    "ml_fixed_size_sample",
    "ml_hash_split",
    "ml_quality_upsample",
    "ml_quantile_filter",
    "ml_sequence_packing",
    "ml_shard_binpack",
    "ml_source_mix",
    "ml_stratified_sample",
    "ml_temperature_mix",
    "ml_token_budget",
    "mm_byte_stats_arrow",
    "mm_decode_real",
    "mm_decode_stats",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_resize",
    "sort_global_dense_ids",
    "text_boilerplate_clean",
    "text_boilerplate_segments",
    "text_bpe_merge_pairs",
    "text_cooccurrence_lift",
    "text_fingerprint",
    "text_inverted_index",
    "text_langid",
    "text_ngram_tf",
    "text_pii_redaction",
    "text_quality_score",
    "text_repetition_profile",
    "text_repetition_score",
    "text_source_overlap",
    "text_stopword_removal",
    "text_tfidf_top_terms",
    "text_token_count_bpe",
    "text_token_stats",
    "text_unigram_rarity",
    "udtf_chunk_documents",
]

_EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (1, "", "en", "empty"),
    (2, "   ", "en", "empty"),
    (3, "a", "en", "tiny"),
    (4, "hello", "en", "tiny"),
    (5, "hello  world", "en", "spacing"),     # double space -> empty token
    (6, " leading and trailing ", "en", "spacing"),
    (7, "héllo wörld café", "fr", "unicode"),
    (8, "你好世界 日本語", "zh", "unicode"),
    (9, "!!! ??? ... ,,, ;;;", "en", "punct"),
    (10, "x x x x x x x x", "en", "repeat"),
    (11, "w" * 200, "en", "longword"),
    (12, "line1\nline2\tend", "en", "control"),
    (13, "123 456 7.89 -10", "en", "digits"),
    (14, "The quick brown fox jumps over the lazy dog", "en", "prose"),
    (15, "The quick brown fox jumps over the lazy dog", "en", "prose"),  # exact dup
    (16, "the the the and and of of of to to", "en", "stopword"),
    (17, "email a@b.co phone 555-123-4567 ssn 123-45-6789", "en", "pii"),
    (18, "mixed CASE Words AND lower case words", "en", "case"),
    # NULL rows (round-7 advice): round 6 added NULL-specific code paths
    # (eqNullSafe ledger join, NULL-text md5/tokenization, asc_nulls_first)
    # that no suite executed — these rows make them differentially tested.
    (19, None, "en", "nulltext"),
    (20, "plain text with null language", None, "nullmeta"),
    (21, "plain text with null source", "en", None),
    (22, None, None, None),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_docs")
    docs = spark.createDataFrame(
        [
            (i, t, lang, src, len(t) if t is not None else None)
            for (i, t, lang, src) in _EDGE_DOCS
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_ONLY)
def test_edge_documents_match_oracle(spark, edge_dir, edge_duck, name):
    q = ALL[name]
    sdf = q.fn(spark, edge_dir)
    rel = edge_duck.sql(q.oracle)
    assert_match(sdf, rel, name=f"{name}[edge]")


# --- edge embeddings: zero / subnormal / duplicate / negative vectors --------

EMB_ONLY = [
    "dedup_embedding_neardup",
    "fn_array_basics",
    "fn_array_higher_order",
    "sim_ann_ivf",
    "sim_ann_ivf_sampled",
    # sim_ann_ivf_trained is deregistered (VERDICT r8 #2); its edge-vector
    # coverage lives in tests/test_ivf_trained_pin.py
    "sim_ann_lsh",
    "sim_ann_lsh_banded",
    "sim_ann_recall_audit",
    "sim_embedding_quantize",
    "sim_knn_bruteforce",
    "sim_label_centroid",
    "sim_lsh_candidate_stats",
    "sim_semantic_prune",
]


def _edge_vec(i: int) -> list[float]:
    """Deterministic pseudo-random direction, distinct per i."""
    return [((i * 31 + d * 17) % 13 - 6) / 7.0 for d in range(64)]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb")
    rows = []
    rows.append((0, [0.0] * 64, 1))                    # zero vector (query id!)
    rows.append((1, [1e-30] * 64, 1))                  # subnormal-ish magnitude
    rows.append((2, _edge_vec(2), 2))
    rows.append((3, _edge_vec(2), 2))                  # exact duplicate of 2
    rows.append((4, [-v for v in _edge_vec(2)], 2))    # antipode (cos -1)
    for i in range(5, 24):
        rows.append((i, _edge_vec(i), i % 10))
    # non-finite coordinates: the ingestion boundary nulls the whole
    # vector (catalog.finite_vector_or_null) — one NaN coord poisons every
    # cosine built on it
    nan_vec = _edge_vec(24)
    nan_vec[7] = float("nan")
    rows.append((24, nan_vec, 3))
    inf_vec = _edge_vec(25)
    inf_vec[0] = float("inf")
    rows.append((25, inf_vec, 4))
    emb = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    emb.coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_emb_duck(edge_emb_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{edge_emb_dir}/embeddings.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_ONLY)
def test_edge_embeddings_match_oracle(spark, edge_emb_dir, edge_emb_duck, name):
    q = ALL[name]
    sdf = q.fn(spark, edge_emb_dir)
    rel = edge_emb_duck.sql(q.oracle)
    assert_match(sdf, rel, name=f"{name}[edge-emb]")


# --- edge events: NULL values, ties, storms, malformed props, off-grid ------

EVT_ONLY = [
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "agg_bitmap_distinct",
    "agg_count_distinct",
    "agg_histogram",
    "agg_hll_sketch_merge",
    "agg_partial_reaggregation",
    "agg_stats",
    "dq_observe_metrics",
    "evt_anomaly_mad",
    "evt_dedup_by_id",
    "evt_funnel",
    "evt_gap_fill_lerp",
    "evt_gap_fill_locf",
    "evt_retention_cohorts",
    "evt_session_window",
    "evt_sliding_window",
    "evt_stateful_running_stats",
    "evt_stateful_running_stats_tws",
    "evt_transition_matrix",
    "evt_tumbling_window",
    "evt_watermark_late_drop",
    "filter_null_semantics",
    "fn_collation_ci",
    "fn_json",
    "fn_map_roundtrip",
    "fn_try_arithmetic",
    "fn_url_parse",
    "fn_variant_json",
    "join_asof",
    "join_asof_forward",
    "onebrc_flagship",
    "onebrc_report",
    "sql_agg_filter_clause",
    "sql_udf_declared",
    "storage_json_roundtrip",
    "udf_grouped_agg_geomean",
    "udf_grouped_map_zscore",
    "udf_scalar_sigmoid",
    "window_first_last_nth",
    "window_lag_lead",
]

_T0 = "2024-03-01 00:0{m}:{s:02d}"

_EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # user 1: normal funnel with a NULL-value click
    (1, "2024-03-01 00:00:00", 1, "signup", 10.00, '{"k": 1}'),
    (2, "2024-03-01 00:01:00", 1, "click", None, '{"k": 2}'),
    (3, "2024-03-01 00:02:00", 1, "purchase", 99.99, '{"k": 3}'),
    # user 2: single event, negative + off-grid value, malformed props
    (4, "2024-03-01 00:00:30", 2, "view", -5.12345, "not json"),
    # user 3: timestamp storm — 4 events at the SAME instant (asof ties,
    # session boundaries), zero values, duplicate event_id (5 twice)
    (5, "2024-03-01 00:05:00", 3, "click", 0.0, '{"k": 0}'),
    (5, "2024-03-01 00:05:00", 3, "click", 0.0, '{"k": 0}'),
    (6, "2024-03-01 00:05:00", 3, "view", 0.0, ""),
    (7, "2024-03-01 00:05:00", 3, "error", 1e9, None),
    # user 4: events exactly on 5-minute window boundaries
    (8, "2024-03-01 00:00:00", 4, "view", 1.25, '{"k": 4}'),
    (9, "2024-03-01 00:05:00", 4, "view", 2.50, '{"k": 5}'),
    (10, "2024-03-01 00:10:00", 4, "view", 3.75, '{"k": 6}'),
    # user 5: all values equal (zero variance), spanning two days (cohorts)
    (11, "2024-03-01 00:00:10", 5, "click", 7.00, '{"k": 7}'),
    (12, "2024-03-02 00:00:10", 5, "click", 7.00, '{"k": 8}'),
    (13, "2024-03-08 00:00:10", 5, "click", 7.00, '{"k": 9}'),
    # user 6: out-of-order arrival (event_id vs ts inverted), late row
    (15, "2024-03-01 00:03:00", 6, "signup", 4.44, '{"k": 10}'),
    (14, "2024-03-01 00:09:00", 6, "purchase", 5.55, '{"k": 11}'),
    # user 7: NaN double values — the engine-ordering divergence class
    # (Spark and DuckDB sort/aggregate NaN as greatest; pandas kernels
    # SKIP NaN in .max()/.mean() unless told otherwise). One NaN among
    # normals, plus a NaN-only user 8.
    (18, "2024-03-01 00:01:00", 7, "click", float("nan"), '{"k": 14}'),
    (19, "2024-03-01 00:02:00", 7, "click", 3.25, '{"k": 15}'),
    (20, "2024-03-01 00:01:30", 8, "view", float("nan"), '{"k": 16}'),
    (21, "2024-03-01 00:02:30", 8, "view", float("inf"), '{"k": 17}'),
    (22, "2024-03-01 00:03:30", 7, "view", float("-inf"), '{"k": 18}'),
    # users 9 and 10: straddle the numeric/lexicographic boundary — any
    # per-station collapse ordered by key STRING ("10" < "9") instead of
    # key VALUE (9 < 10) becomes observable (the round-5 onebrc_report
    # defect class). Benign payloads: unique extremes, valid JSON.
    (16, "2024-03-01 00:04:00", 9, "view", 8.25, '{"k": 12}'),
    (17, "2024-03-01 00:06:00", 10, "view", 9.75, '{"k": 13}'),
]


@pytest.fixture(scope="module")
def edge_evt_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_evt")
    ev = spark.createDataFrame(
        _EDGE_EVENTS,
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )
    # Spark's default parquet timestamp encoding is legacy INT96, which the
    # catalog's footer unit-sniffing (and DuckDB) reads differently than
    # the driver's INT64 fixtures — write MICROS like the driver does.
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    # Some events-only queries register the whole catalog (register_views):
    # link the untouched sf0.001 tables so only `events` is adversarial.
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_evt_duck(edge_evt_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{edge_evt_dir}/events.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVT_ONLY)
def test_edge_events_match_oracle(spark, edge_evt_dir, edge_evt_duck, name):
    q = ALL[name]
    sdf = q.fn(spark, edge_evt_dir)
    rel = edge_evt_duck.sql(q.oracle)
    assert_match(sdf, rel, name=f"{name}[edge-evt]")


# --- edge CATALOG: all 10 tables adversarial, entire registry swept ----------
#
# NULL keys and NULL measures, orphan foreign keys (nation->region 99,
# customer/supplier->nation 99, orders->customer 999, lineitem->orders 999),
# customers with no orders, zero/negative/huge monetary values, discount at
# both bounds, NULL dates and grouping keys, full-row duplicates. Design
# constraints respected: per-group min_by/max_by extremes stay unique among
# non-NULL values (the operator's documented tie precondition), and no two
# rows share a window sort key with different payloads (full-row duplicates
# are multiset-safe; partial ones would make rank output ambiguous in BOTH
# engines).

_EDGE_TPCH = {
    "region": (
        [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
         (4, "MIDDLE EAST"), (5, "")],
        "r_regionkey INT, r_name STRING",
    ),
    "nation": (
        [(0, "NATION_0", 0), (1, "NATION_1", 1), (2, "NATION_2", 2),
         (3, "NATION_3", 3), (4, "NATION_4", 99), (5, None, None)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    ),
    "customer": (
        [(1, "Customer#1", 0, 100.50, "BUILDING"),
         (2, "Customer#2", 1, -999.99, "AUTOMOBILE"),
         (3, "Customer#3", 2, 0.0, "MACHINERY"),
         (4, "Customer#4", 99, 55.25, "HOUSEHOLD"),     # orphan nation
         (5, "Customer#5", None, None, None),            # NULL everything
         (6, "Customer#6", 3, 7000.01, "FURNITURE"),    # no orders (q22)
         (7, "Customer#2", 1, 42.42, "BUILDING"),       # duplicate name
         (8, "Customer#8", 0, 0.01, "BUILDING")],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, "
        "c_mktsegment STRING",
    ),
    "supplier": (
        [(1, "Supplier#1", 0, 10.00),
         (2, "Supplier#2", 1, -5.75),
         (3, "Supplier#3", 99, 0.0),                     # orphan nation
         (4, "Supplier#4", 2, None),                     # NULL acctbal
         (5, "Supplier#1", 3, 99.99)],                   # duplicate name
        "s_suppkey LONG, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    ),
    "part": (
        [(1, "part one", "Brand#5", "SMALL", 1, 10.00),
         (2, "part two", "Brand#5", "ECONOMY", 0, 0.0),   # size 0, free
         (3, "part three", "Brand#25", "PROMO", -1, 25.25),  # negative size
         (4, "part four", "Brand#14", None, 50, None),    # NULL type/price
         (5, "part five", "Brand#24", "LARGE", 7, 3.50),
         (6, "part six", "Brand#12", "STANDARD", 7, 8.75)],
        "p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ),
    "orders": (
        [(1, 1, "O", 100.00, "1995-01-01 00:00:00", "1-URGENT"),
         (2, 1, "F", 250.50, "1996-06-15 00:00:00", "2-HIGH"),
         (3, 2, "P", 0.0, "1997-03-10 00:00:00", "3-MEDIUM"),
         (4, 3, "O", 1e7, "1997-03-10 00:00:00", "4-NOT SPECIFIED"),
         (5, 4, "F", None, "1998-11-30 00:00:00", "5-LOW"),   # NULL price
         (6, 5, "O", 77.77, None, "1-URGENT"),                # NULL date
         (7, 999, "F", 31.00, "1999-02-28 00:00:00", "2-HIGH"),  # orphan cust
         (8, 999, "O", 32.00, "2000-02-29 00:00:00", "5-LOW"),   # leap day
         (9, None, "P", 33.00, "2001-08-01 00:00:00", "3-MEDIUM"),  # NULL cust
         (10, 8, "O", 44.44, "1995-01-01 00:00:00", "1-URGENT")],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING",
    ),
    "lineitem": (
        [(1, 1, 1, 1, 5.0, 100.00, 0.05, 0.02, "R", "O", "1995-02-01 00:00:00"),
         (1, 2, 2, 2, 0.0, 0.0, 0.0, 0.0, "A", "F", "1995-02-03 00:00:00"),
         (2, 3, 3, 1, 3.0, 75.50, 1.0, 0.08, "N", "O", "1996-07-01 00:00:00"),
         (2, 4, 4, 2, None, None, None, None, None, None, None),  # NULL row
         (3, 5, 5, 1, 7.0, 200.25, 0.10, 0.0, "R", "F", "1997-04-01 00:00:00"),
         (3, 5, 5, 1, 7.0, 200.25, 0.10, 0.0, "R", "F", "1997-04-01 00:00:00"),
         # ^ full-row duplicate (multiset-safe)
         (4, 6, 1, 1, 50.0, 9999.99, 0.07, 0.04, "A", "O", "1997-05-05 00:00:00"),
         (5, 1, 2, 1, 2.0, 20.00, 0.02, 0.01, "N", "F", "1998-12-01 00:00:00"),
         (6, 2, 3, 1, 4.0, 44.00, 0.04, 0.02, "R", "O", "1999-01-01 00:00:00"),
         (999, 3, 4, 1, 9.0, 90.00, 0.09, 0.03, "A", "F", "1999-06-01 00:00:00"),
         # ^ orphan orderkey
         (7, 4, 5, 1, 1.0, 11.11, 0.0, 0.0, "N", "O", "2000-03-01 00:00:00"),
         (8, 5, 1, 1, 6.0, 66.60, 0.06, 0.05, "R", "F", "2001-07-31 00:00:00")],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
        "l_shipdate STRING",
    ),
}


@pytest.fixture(scope="module")
def edge_cat_dir(spark, tmp_path_factory, edge_dir, edge_emb_dir, edge_evt_dir):
    """All 10 tables adversarial: TPC-H edge tables built here, documents /
    embeddings / events reused from the single-table edge fixtures."""
    import shutil

    d = tmp_path_factory.mktemp("edge_catalog")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        for name, (rows, schema) in _EDGE_TPCH.items():
            df = spark.createDataFrame(rows, schema)
            for c, t in (("o_orderdate", "orders"), ("l_shipdate", "lineitem")):
                if name == t:
                    df = df.withColumn(c, df[c].cast("timestamp"))
            df.coalesce(1).write.mode("overwrite").parquet(
                str(d / f"{name}.parquet")
            )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    shutil.copytree(f"{edge_dir}/documents.parquet", str(d / "documents.parquet"))
    shutil.copytree(
        f"{edge_emb_dir}/embeddings.parquet", str(d / "embeddings.parquet")
    )
    shutil.copytree(f"{edge_evt_dir}/events.parquet", str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_cat_duck(edge_cat_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{edge_cat_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_edge_catalog_matches_oracle(spark, edge_cat_dir, edge_cat_duck, name):
    q = ALL[name]
    sdf = q.fn(spark, edge_cat_dir)
    rel = edge_cat_duck.sql(q.oracle)
    assert_match(sdf, rel, name=f"{name}[edge-cat]")


# --- edge EMPTY catalog: all 10 tables present, all 0 rows -------------------
#
# The "empty partition day" reality: a pipeline pointed at a day/source with
# no data must produce empty (or census-zero) results, not crash. This class
# executes code paths no populated fixture reaches: iterative convergence
# probes over empty edge sets, k-means over an empty sample, min/max over
# nothing, windows over zero partitions.


@pytest.fixture(scope="module")
def edge_empty_dir(spark, tmp_path_factory):
    from onebrc_spark import schemas

    d = tmp_path_factory.mktemp("edge_empty")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        for name, schema in schemas.TABLES.items():
            spark.createDataFrame([], schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(d / f"{name}.parquet"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return str(d)


@pytest.fixture(scope="module")
def edge_empty_duck(edge_empty_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{edge_empty_dir}/{t}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_edge_empty_catalog_matches_oracle(spark, edge_empty_dir, edge_empty_duck, name):
    q = ALL[name]
    sdf = q.fn(spark, edge_empty_dir)
    rel = edge_empty_duck.sql(q.oracle)
    assert_match(sdf, rel, name=f"{name}[edge-empty]")
