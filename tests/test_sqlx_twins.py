"""r13 optimization round: the SQL-string fast paths must stay bit-identical
to the legacy Column-built forms.

The hot expression builders (word_3grams, minhash_signature, cosine,
_cell_scores) gained an F.expr construction path — one JVM parse instead of
hundreds of py4j round trips per query build (OPTIMIZATION_r13.md). These
tests pin str-path == Column-path on real fixture data so the two
implementations cannot drift.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from onebrc_spark.operators import dedup, similarity
from onebrc_spark.sources.catalog import load_table

from tests.conftest import SMOKE_SF_DIR


def test_word_3grams_sqlx_equals_column_path(spark):
    d = load_table(spark, SMOKE_SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    both = d.select(
        "doc_id",
        dedup.word_3grams("text").alias("s"),
        dedup.word_3grams(F.col("text")).alias("c"),
    ).collect()
    assert both and all(r["s"] == r["c"] for r in both)


def test_minhash_signature_sqlx_equals_column_path(spark):
    d = load_table(spark, SMOKE_SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    ws = d.select("doc_id", dedup.word_3grams("text").alias("ws"))
    both = ws.select(
        dedup.minhash_signature("ws").alias("s"),
        dedup.minhash_signature(F.col("ws")).alias("c"),
    ).collect()
    assert both and all(r["s"] == r["c"] for r in both)


def test_cosine_sqlx_equals_column_path(spark):
    e = load_table(spark, SMOKE_SF_DIR, "embeddings")
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(500)
    both = pairs.select(
        similarity.cosine("ea", "eb").alias("s"),
        similarity.cosine(F.col("ea"), F.col("eb")).alias("c"),
    ).collect()
    # bit-identical doubles (or both NULL), not approximately equal
    assert both and all(r["s"] == r["c"] for r in both)


def test_cell_scores_sqlx_equals_column_path(spark):
    e = load_table(spark, SMOKE_SF_DIR, "embeddings")
    both = e.select(
        similarity._cell_scores("embedding").alias("s"),
        similarity._cell_scores(F.col("embedding")).alias("c"),
    ).collect()
    assert both and all(r["s"] == r["c"] for r in both)


def test_sql_double_array_roundtrips_exactly(spark):
    vals = [0.1, -2.5e-17, 1234567.875, float(np.float64(1) / 3)]
    row = spark.range(1).select(
        F.expr(similarity.sql_double_array(vals)).alias("a"),
        F.lit(np.asarray(vals, dtype=np.float64)).alias("b"),
    ).collect()[0]
    assert row["a"] == row["b"] == vals


def test_simhash_sqlx_equals_column_path(spark):
    d = load_table(spark, SMOKE_SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    hashed = d.select(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"),
        ).alias("hs")
    )
    both = hashed.select(
        dedup.simhash64("hs", bits=60).alias("s"),
        dedup.simhash64(F.col("hs"), bits=60).alias("c"),
    ).collect()
    assert both and all(r["s"] == r["c"] for r in both)


def test_lsh_bucket_sqlx_equals_column_path(spark):
    e = load_table(spark, SMOKE_SF_DIR, "embeddings")
    both = e.select(
        similarity.lsh_bucket("embedding").alias("s"),
        similarity.lsh_bucket(F.col("embedding")).alias("c"),
    ).collect()
    assert both and all(r["s"] == r["c"] for r in both)


def test_minhash_pairs_sql_equals_helper_composition(spark):
    """r14: the one-SQL post-checkpoint build (_pairs_sql_from_collapsed)
    must emit exactly the pair set of the Column-API helper composition
    (minhash_band_candidates → minhash_verify_pairs → minhash_expand_pairs)
    it replaced — CTE for helper, over the same collapsed table."""
    from onebrc_spark.sources.catalog import load_table, spread, spread_width
    from tests.conftest import SF_DIR

    src = load_table(spark, SF_DIR, "documents")
    width = spread_width(src, spark)
    slim = dedup._minhash_slim(spread(src, spark))
    dupc = dedup._dup_census(slim).coalesce(width).persist()
    collapsed = dedup._collapsed_rows(slim, dupc).coalesce(width).persist()
    try:
        collapsed.createOrReplaceTempView("_twin_mh_collapsed")
        sql_rows = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.sql(
                dedup._pairs_sql_from_collapsed(
                    "_twin_mh_collapsed", dedup._BAND_OCCUPANCY_CAP
                )
            ).collect()
        )
        ws = collapsed.select("doc_id", "ws")
        cands = dedup.minhash_band_candidates(ws)
        helper = dedup.minhash_expand_pairs(
            dedup.minhash_verify_pairs(ws, cands), collapsed
        )
        helper_rows = sorted(
            (r.doc_a, r.doc_b, r.jaccard) for r in helper.collect()
        )
        assert sql_rows, "empty pair set would vacuously pass"
        assert sql_rows == helper_rows
    finally:
        dupc.unpersist()
        collapsed.unpersist()
        spark.catalog.dropTempView("_twin_mh_collapsed")


def test_admission_sql_equals_helper_composition(spark):
    """r14: the one-SQL admission query (_admission_sql) must emit exactly
    the manifest of the helper composition it replaced."""
    from pyspark.sql import functions as F

    from onebrc_spark.operators import incremental as inc
    from onebrc_spark.sources.catalog import load_table, spread
    from tests.conftest import SF_DIR

    docs = spread(load_table(spark, SF_DIR, "documents"), spark)
    docs.createOrReplaceTempView("_twin_adm_docs")
    try:
        sql_rows = [
            tuple(r)
            for r in spark.sql(inc._admission_sql("_twin_adm_docs")).collect()
        ]
        rejected = inc.incremental_rejections(
            docs, inc.is_new_batch(F.col("doc_id"))
        )
        batch, _ = inc._split_batch_corpus(docs, inc.is_new_batch(F.col("doc_id")))
        helper = (
            batch.select("doc_id", "source")
            .join(rejected.select("doc_id", "reason"), "doc_id", "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_new"),
                F.sum(F.when(F.col("reason").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_admitted"),
                F.sum(F.when(F.col("reason").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_rejected"),
            )
            .orderBy("source")
        )
        helper_rows = [tuple(r) for r in helper.collect()]
        assert sql_rows and sql_rows == helper_rows
    finally:
        spark.catalog.dropTempView("_twin_adm_docs")


def test_boilerplate_sql_equals_helper_composition(spark):
    """r14: the one-SQL boilerplate ledger and clean queries must emit
    exactly what the helper compositions they replaced emitted."""
    from onebrc_spark.operators import curation as cu
    from onebrc_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents")
    d.createOrReplaceTempView("_twin_boiler_docs")
    try:
        # --- ledger ---
        segs_sql = spark.sql(cu._boiler_occurrence_sql("_twin_boiler_docs"))
        segs_sql.createOrReplaceTempView("_twin_boiler_segs")
        sql_ledger = [
            tuple(r)
            for r in spark.sql(
                cu._boiler_ledger_sql("_twin_boiler_docs", "_twin_boiler_segs")
            ).collect()
        ]
        segs = cu._boiler_occurrences(
            d.select("doc_id", "source", cu._boiler_tokens(F.col("text")).alias("t"))
        ).select(
            "doc_id", "source",
            F.xxhash64("seg").alias("h"), F.length("seg").alias("seg_chars"),
        )
        hot = (
            segs.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df") >= cu._BOILER_TAU)
            .select("h", F.lit(1).alias("hot"))
        )
        marked = segs.join(F.broadcast(hot), "h", "left").withColumn(
            "hot", F.coalesce("hot", F.lit(0))
        )
        seg_stats = marked.groupBy("source").agg(
            F.count(F.lit(1)).alias("segs_total"),
            F.sum("hot").alias("segs_removed"),
            F.sum(F.when(F.col("hot") == 1, F.col("seg_chars")).otherwise(0)).alias(
                "chars_removed"
            ),
            F.countDistinct(F.when(F.col("hot") == 1, F.col("doc_id"))).alias(
                "docs_touched"
            ),
        )
        base = d.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        )
        helper_ledger = [
            tuple(r)
            for r in base.alias("b")
            .join(seg_stats.alias("s"),
                  F.col("b.source").eqNullSafe(F.col("s.source")), "left")
            .select(
                F.col("b.source").alias("source"), "n_docs",
                F.coalesce("docs_touched", F.lit(0)).cast("long").alias("docs_touched"),
                F.coalesce("segs_total", F.lit(0)).cast("long").alias("segs_total"),
                F.coalesce("segs_removed", F.lit(0)).cast("long").alias("segs_removed"),
                F.coalesce("chars_removed", F.lit(0)).cast("long").alias("chars_removed"),
            )
            .orderBy(F.asc_nulls_first("source"))
            .collect()
        ]
        assert sql_ledger and sql_ledger == helper_ledger

        # --- clean ---
        sql_clean = [
            tuple(r)
            for r in spark.sql(cu._boiler_clean_sql("_twin_boiler_docs")).collect()
        ]
        segged = d.select(
            "doc_id", cu._boiler_tokens(F.col("text")).alias("t")
        ).select("doc_id", cu._boiler_seg_array(F.col("t")).alias("segs"))
        hot2 = cu._boiler_hot_hashes(segged).agg(
            F.collect_set("h").alias("hot_set")
        )
        kept = F.filter(
            "segs", lambda s: ~F.array_contains(F.col("hot_set"), F.xxhash64(s))
        )
        helper_clean = [
            tuple(r)
            for r in segged.crossJoin(F.broadcast(hot2))
            .select(
                "doc_id",
                F.size("segs").cast("long").alias("n_segs"),
                (F.size("segs") - F.size(kept)).cast("long").alias("n_removed"),
                F.array_join(kept, " ").alias("cleaned_text"),
            )
            .orderBy("doc_id")
            .collect()
        ]
        assert sql_clean and sql_clean == helper_clean
    finally:
        spark.catalog.dropTempView("_twin_boiler_docs")
        spark.catalog.dropTempView("_twin_boiler_segs")
