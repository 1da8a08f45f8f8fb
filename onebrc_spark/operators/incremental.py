"""Incremental corpus admission: dedup a NEW ingest batch against an
EXISTING corpus (SURVEY §2.10 X1/X2 extension — the production ingest shape).

Batch-vs-batch dedup (dedup.py) answers "is this corpus internally unique";
a production training-data pipeline almost never re-runs that global job.
Day to day it answers the *incremental* question: given ~100 TB of already-
admitted documents and today's crawl, which new documents are duplicates of
something we already have? The reference has no notion of incremental state
at all (one batch query over one file, `python_1brc/main.py:15-22`); this is
extension surface for the LLM curation path.

Two admission gates, cheapest first:

  1. **Exact**: md5(text) of each new doc semi-joined against the corpus
     digest set — rejects byte-identical re-crawls for the cost of one
     digest shuffle (no text moves, no shingling).
  2. **Near-dup**: MinHash band signatures (identical construction to
     dedup.dedup_minhash_lsh: 12 hashes, 4 bands × 3 rows) joined
     batch-side × corpus-side only — the key asymmetry. Candidates are
     verified with exact shingle-Jaccard ≥ 0.7, so LSH prunes and Jaccard
     decides, same as the batch operator.

Why this scales where re-running global dedup doesn't: the corpus×corpus
quadrant — overwhelmingly the largest — is never joined. Band signatures
for the corpus are computed once per ingest epoch (in production they live
as a bucketed table keyed on (band, band_sig), paid at admission time, so
each day's join touches only matching buckets); the batch side is small.
Work per ingest ≈ O(|batch| + collisions), independent of corpus size.

The "new batch" predicate here is a content-addressed ~19% sample
(first md5 hex digit of doc_id < 3, same bucketing idiom as
ml_cluster_safe_split) so the split is stable under testdata regeneration
and uncorrelated with source — the oracle reproduces it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from onebrc_spark.operators.dedup import (
    _LSH_BANDS,
    _LSH_ROWS,
    _MINHASH_N,
    _MINHASH_THRESHOLD,
    _affine_sql,
    _base_digits_sql,
    _minhash_signature_sqlx,
    _word_3grams_sqlx,
    minhash_signature,
    word_3grams,
)
from onebrc_spark.registry import query
from onebrc_spark.sources.catalog import load_table, spread

# New-batch bucket: first md5 hex digit of doc_id in [0, _NEW_BUCKET_MAX) →
# ~3/16 ≈ 19% of the corpus plays "today's crawl".
_NEW_BUCKET_MAX = 3


def is_new_batch(doc_id: Column) -> Column:
    """Content-addressed batch membership (deterministic, source-agnostic) —
    built on mlprep's ONE md5-bucket idiom (round-5 dedup of 4 copies)."""
    from onebrc_spark.operators.mlprep import _hash_bucket

    return _hash_bucket(doc_id) < _NEW_BUCKET_MAX


def _is_new_sql(expr: str) -> str:
    from onebrc_spark.operators.mlprep import hash_bucket_sql

    return f"({hash_bucket_sql(expr)}) < {_NEW_BUCKET_MAX}"


def _band_table(docs_ws: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) from (doc_id, ws) — the ARRAY-keyed band
    form, kept for the BUCKETED corpus asset (corpus_band_table), where
    the (band, band_sig) columns are the bucket keys themselves. The
    in-flight batch×corpus join uses _band_key_table's hashed 64-bit keys
    instead (see there for why)."""
    sigs = docs_ws.select(
        "doc_id", minhash_signature("ws").alias("sig")
    )
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.slice(F.col("sig"), band * _LSH_ROWS + 1, _LSH_ROWS).alias(
                            "band_sig"
                        ),
                    )
                    for band in range(_LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.band_sig")


def _split_batch_corpus(
    docs: DataFrame, new_col: Column
) -> tuple[DataFrame, DataFrame]:
    """The ONE derivation of the is_new split — every consumer (both
    rejection gates AND the admission manifest) must see the identical
    membership, so batch/corpus frames come from here only. All input
    columns are carried (Catalyst prunes the unused ones), so manifest
    consumers can keep e.g. `source` without a second derivation."""
    tagged = docs.withColumn("is_new", new_col)
    return (
        tagged.filter(F.col("is_new")).drop("is_new"),
        tagged.filter(~F.col("is_new")).drop("is_new"),
    )


def _band_key_table(docs_ws: DataFrame) -> DataFrame:
    """(doc_id, band_key): one xxhash64 long per band over the signature
    slice — the in-flight join form, mirroring dedup.py's round-5 band-key
    change (8-byte shuffle keys + primitive codegen compares, measured
    ~25% off the array-keyed join there). Equal slices always hash equal,
    so no true candidate is lost; a collision only ADDS a candidate, which
    the exact-Jaccard verification downstream rejects."""
    sigs = docs_ws.select("doc_id", minhash_signature("ws").alias("sig"))
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(band),
                        *[
                            F.element_at(F.col("sig"), band * _LSH_ROWS + j + 1)
                            for j in range(_LSH_ROWS)
                        ],
                    )
                    for band in range(_LSH_BANDS)
                ]
            )
        ).alias("band_key"),
    )


def _candidates_from_split(batch: DataFrame, corpus: DataFrame) -> DataFrame:
    bb = _band_key_table(
        batch.select("doc_id", word_3grams("text").alias("ws"))
    ).alias("bb")
    cb = _band_key_table(
        corpus.select("doc_id", word_3grams("text").alias("ws"))
    ).alias("cb")
    return (
        bb.join(cb, F.col("bb.band_key") == F.col("cb.band_key"))
        .select(
            F.col("bb.doc_id").alias("new_id"), F.col("cb.doc_id").alias("corpus_id")
        )
        .distinct()
    )


def lsh_candidates(docs: DataFrame, new_col: Column) -> DataFrame:
    """(new_id, corpus_id) LSH band-collision candidates of the new batch
    against the corpus — batch×corpus ONLY; the corpus never self-joins
    (pinned structurally in tests/test_plans.py)."""
    return _candidates_from_split(*_split_batch_corpus(docs, new_col))


def incremental_rejections(
    docs: DataFrame, new_col: Column, threshold: float = _MINHASH_THRESHOLD
) -> DataFrame:
    """doc_ids of NEW documents rejected against the existing corpus, with
    the gate that caught them: (doc_id, reason ∈ {'exact', 'near'}).

    `docs` needs (doc_id, text); `new_col` is the batch-membership boolean.
    Exact rejections are decided first; the near gate only ever adds docs
    the exact gate admitted (a doc is counted once, by its cheapest gate).
    """
    batch, corpus = _split_batch_corpus(docs, new_col)

    # Gate 1 — exact: digests only cross the wire, never text.
    corpus_digests = corpus.select(F.md5("text").alias("digest")).distinct()
    exact_rej = (
        batch.select("doc_id", F.md5("text").alias("digest"))
        .join(corpus_digests, "digest", "left_semi")
        .select("doc_id", F.lit("exact").alias("reason"))
    )

    # Gate 2 — near-dup: batch bands × corpus bands ONLY (the corpus never
    # self-joins), then exact-Jaccard verification of the candidates. The
    # candidate set (not the corpus) drives the verify joins: texts are
    # attached per candidate pair and shingled THERE, so the full corpus
    # is shingled exactly once (for banding) — verification work is
    # O(candidates), and the small candidate side broadcasts, leaving the
    # corpus text scan exchange-free.
    candidates = _candidates_from_split(batch, corpus)
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = (
        F.size("ws_a") + F.size("ws_b") - F.size(F.array_intersect("ws_a", "ws_b"))
    )
    near_rej = (
        candidates.join(
            batch.select(
                F.col("doc_id").alias("new_id"), F.col("text").alias("text_a")
            ),
            "new_id",
        )
        .join(
            corpus.select(
                F.col("doc_id").alias("corpus_id"), F.col("text").alias("text_b")
            ),
            "corpus_id",
        )
        .withColumn("ws_a", word_3grams("text_a"))
        .withColumn("ws_b", word_3grams("text_b"))
        # ANSI-0/0 guard (edge-fixture class): two sub-3-gram docs always
        # band-collide (empty sets share a signature) and their undefined
        # Jaccard must DROP — DuckDB's x/0 is NULL, Spark would throw.
        .filter(
            inter / F.when(union == 0, F.lit(None)).otherwise(union) >= threshold
        )
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .join(exact_rej.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit("near").alias("reason"))
    )
    return exact_rej.unionByName(near_rej)


def _admission_sql(view: str) -> str:
    """The full admission query as ONE Spark-SQL statement over the spread
    documents view (r14, guide §1.2 step 2 — the one-parse technique the
    minhash build uses, see dedup._pairs_sql_from_collapsed). The Column
    composition built ~1,700 py4j round trips per query build, re-analyzing
    the shingle/signature forests at every Dataset creation; this is one
    parse + one analysis. Each CTE mirrors its helper (the helpers stay —
    incremental_rejections/lsh_candidates are the reference twins and the
    streaming gate's building blocks); the SQL path is pinned row-identical
    in tests/test_sqlx_twins.py and end-to-end by the DuckDB oracle."""
    h = f"ascii(substring(md5(CAST(doc_id AS STRING)), 1, 1))"
    is_new = (
        f"(CASE WHEN {h} <= 57 THEN {h} - 48 ELSE {h} - 87 END) "
        f"< {_NEW_BUCKET_MAX}"
    )
    sig = _minhash_signature_sqlx("ws")
    band_terms = ", ".join(
        "xxhash64({b}, {els})".format(
            b=band,
            els=", ".join(
                f"element_at(sig, {band * _LSH_ROWS + j + 1})"
                for j in range(_LSH_ROWS)
            ),
        )
        for band in range(_LSH_BANDS)
    )
    ai = "size(array_intersect(ws_a, ws_b))"
    un = f"(size(ws_a) + size(ws_b) - {ai})"
    bkeys = (
        "SELECT doc_id, band_key FROM ("
        f"  SELECT doc_id, {sig} AS sig FROM ("
        f"    SELECT doc_id, {_word_3grams_sqlx('text')} AS ws FROM {{side}})) s"
        f" LATERAL VIEW explode(array({band_terms})) t AS band_key"
    )
    return f"""
    WITH tagged AS (
      SELECT doc_id, source, text, {is_new} AS is_new FROM {view}
    ),
    batch AS (SELECT doc_id, source, text FROM tagged WHERE is_new),
    corpus AS (SELECT doc_id, text FROM tagged WHERE NOT is_new),
    exact_rej AS (
      SELECT doc_id, 'exact' AS reason FROM (
        SELECT b.doc_id FROM (SELECT doc_id, md5(text) AS digest FROM batch) b
        LEFT SEMI JOIN (SELECT DISTINCT md5(text) AS digest FROM corpus) c
          ON b.digest = c.digest
      )
    ),
    bb AS ({bkeys.format(side="batch")}),
    cb AS ({bkeys.format(side="corpus")}),
    cand AS (
      SELECT DISTINCT bb.doc_id AS new_id, cb.doc_id AS corpus_id
      FROM bb JOIN cb ON bb.band_key = cb.band_key
    ),
    near_pairs AS (
      SELECT c.new_id,
             {_word_3grams_sqlx('ba.text')} AS ws_a,
             {_word_3grams_sqlx('co.text')} AS ws_b
      FROM cand c
      JOIN batch ba ON ba.doc_id = c.new_id
      JOIN corpus co ON co.doc_id = c.corpus_id
    ),
    near_hit AS (
      SELECT DISTINCT new_id AS doc_id FROM near_pairs
      WHERE CAST({ai} AS DOUBLE) /
            (CASE WHEN {un} = 0 THEN NULL ELSE {un} END)
            >= {_MINHASH_THRESHOLD}D
    ),
    near_rej AS (
      SELECT n.doc_id, 'near' AS reason FROM near_hit n
      LEFT ANTI JOIN exact_rej e ON n.doc_id = e.doc_id
    ),
    rejected AS (
      SELECT doc_id, reason FROM exact_rej
      UNION ALL
      SELECT doc_id, reason FROM near_rej
    )
    SELECT b.source,
           count(1) AS n_new,
           CAST(sum(CASE WHEN r.reason IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted,
           CAST(sum(CASE WHEN r.reason IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rejected
    FROM (SELECT doc_id, source FROM batch) b
    LEFT JOIN rejected r ON b.doc_id = r.doc_id
    GROUP BY b.source ORDER BY b.source
    """


@query(
    "dedup_incremental_admission",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, source, text, {_is_new_sql("doc_id")} AS is_new
      FROM documents
    ), toks AS (
      SELECT doc_id, is_new, string_split(text, ' ') AS raw_ws FROM tagged
    ), words AS (
      SELECT doc_id, is_new,
             list_distinct(list_transform(
               range(1, greatest(len(raw_ws) - 1, 1)),
               i -> raw_ws[i] || ' ' || raw_ws[i+1] || ' ' || raw_ws[i+2])) AS ws
      FROM toks
    ), based AS (
      SELECT doc_id, is_new,
             list_transform(ws, w -> {_base_digits_sql("w")}) AS bases
      FROM words
    ), sigs AS (
      SELECT doc_id, is_new,
             [{", ".join("list_min(list_transform(bases, h -> " + _affine_sql("h", s) + "))" for s in range(_MINHASH_N))}]
               AS sig
      FROM based
    ), bands AS (
      SELECT doc_id, is_new, band,
             sig[band*{_LSH_ROWS}+1:band*{_LSH_ROWS}+{_LSH_ROWS}] AS band_sig
      FROM sigs, (SELECT unnest(range({_LSH_BANDS})) AS band)
    ), exact_rej AS (
      SELECT DISTINCT b.doc_id
      FROM tagged b JOIN tagged c
        ON b.is_new AND NOT c.is_new AND md5(b.text) = md5(c.text)
    ), cand AS (
      SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS corpus_id
      FROM bands b JOIN bands c
        ON b.is_new AND NOT c.is_new
       AND b.band = c.band AND b.band_sig = c.band_sig
    ), near_rej AS (
      SELECT DISTINCT new_id AS doc_id
      FROM cand
      JOIN words wa ON wa.doc_id = cand.new_id
      JOIN words wb ON wb.doc_id = cand.corpus_id
      WHERE CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE)
            / (len(wa.ws) + len(wb.ws) - len(list_intersect(wa.ws, wb.ws)))
            >= {_MINHASH_THRESHOLD}
        AND new_id NOT IN (SELECT doc_id FROM exact_rej)
    ), rejected AS (
      SELECT doc_id FROM exact_rej UNION SELECT doc_id FROM near_rej
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted,
           CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rejected
    FROM tagged t LEFT JOIN rejected r ON t.doc_id = r.doc_id
    WHERE t.is_new
    GROUP BY t.source ORDER BY t.source
    """,
    survey_ref="X1b,X1,X2 (incremental ingest: new batch deduped against corpus)",
)
def dedup_incremental_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source admission manifest for an incremental ingest: a ~19%
    content-addressed batch of `documents` plays today's crawl, the rest is
    the standing corpus; each new doc passes an exact-digest gate then a
    MinHash-LSH near-dup gate (both against the CORPUS side only — the
    corpus never self-joins, which is what keeps the ingest cost independent
    of corpus size at 100 TB). Oracle reproduces both gates, signatures and
    all, in DuckDB; the per-source admitted/rejected counts hash-verify the
    full pipeline."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    # ONE spark.sql for the whole pipeline (r14, see _admission_sql): the
    # is_new split is derived exactly once inside the statement (the
    # tagged CTE), preserving the one-derivation invariant the helper API
    # enforces structurally. The view resolves at the sql() call, so the
    # returned frame is immune to later re-registrations.
    view = "_onebrc_adm_docs"
    docs.createOrReplaceTempView(view)
    return spark.sql(_admission_sql(view))


# --- Production shape: the corpus band table as a bucketed asset ------------

_BAND_BUCKETS = 8


def corpus_band_table(
    spark: SparkSession, corpus: DataFrame, table_name: str, path: str
) -> DataFrame:
    """Materialize the standing corpus's LSH band table as a BUCKETED table
    on (band, band_sig) — the asset the docstring above says production
    pays for once per admission epoch. Each ingest's candidate join then
    reads it with NO corpus-side exchange (pinned in tests/test_plans.py):
    the shuffle that positions corpus signatures by band collision
    happened at write time, amortized over every subsequent ingest.
    Spark's bucket hash supports the array-typed band_sig directly, so
    the bucket keys ARE the join keys — no surrogate key needed."""
    ws = corpus.select("doc_id", word_3grams("text").alias("ws"))
    bands = _band_table(ws)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        bands.write.bucketBy(_BAND_BUCKETS, "band", "band_sig")
        .sortBy("band")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


def bucketed_candidates(batch: DataFrame, corpus_bands: DataFrame) -> DataFrame:
    """(new_id, corpus_id) LSH candidates of a new batch against a
    pre-bucketed corpus band table (see corpus_band_table). The batch side
    is banded in-flight and shuffled to the bucket layout (or broadcast
    when small); the corpus side is read in place."""
    ws_batch = batch.select("doc_id", word_3grams("text").alias("ws"))
    bb = _band_table(ws_batch)
    cb = corpus_bands
    return (
        bb.alias("bb")
        .hint("shuffle_merge")
        .join(
            cb.alias("cb"),
            (F.col("bb.band") == F.col("cb.band"))
            & (F.col("bb.band_sig") == F.col("cb.band_sig")),
        )
        .select(
            F.col("bb.doc_id").alias("new_id"), F.col("cb.doc_id").alias("corpus_id")
        )
        .distinct()
    )
