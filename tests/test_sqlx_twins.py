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
