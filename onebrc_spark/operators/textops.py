"""Text analysis operators for LLM-pipeline curation (SURVEY §2.10 X4).

Language-ID (marker-word heuristic), quality scoring (length/ratio
features), token counting (whitespace + BPE-ish regex), corpus n-gram
term frequency, and document fingerprinting (polynomial rolling hash).

All pure JVM expressions (split/transform/aggregate/groupBy) — no Python in
the hot path; every operator has an exact DuckDB oracle. Scale: these are
embarrassingly-parallel per-row maps plus one hash aggregation each; nothing
here shuffles the text itself except the explicit n-gram explode (X4 tf),
whose shuffle key is the gram string — the classic wordcount shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from onebrc_spark.registry import query
from onebrc_spark.sources.catalog import load_table, spread

_WORDS = lambda c: F.split(c, " ")  # noqa: E731

# Marker vocabularies for the language-ID heuristic. On real corpora these
# would be per-language stopword n-gram profiles; the synthetic documents
# table shares one vocabulary, so the markers are arbitrary-but-fixed tokens
# — the *operator shape* (per-language hit scoring + argmax) is what scales.
_LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["data", "table", "row", "column"],
    "fr": ["join", "merge", "sort", "order"],
}


def _hits(words: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def _hits_sql(ws: str, markers: list[str]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter({ws}, w -> list_contains({arr}, w)))"


@query(
    "text_token_stats",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws,
                         length(text) AS n_ch
                  FROM documents)
    SELECT doc_id, lang,
           len(ws) AS n_tokens,
           len(list_distinct(ws)) AS n_types,
           CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
           n_ch AS n_chars_computed,
           CAST(n_ch AS DOUBLE) / len(ws) AS chars_per_token
    FROM toks ORDER BY doc_id
    """,
    survey_ref="X4",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts, type-token ratio, chars-per-token."""
    d = load_table(spark, sf_dir, "documents")
    ws = _WORDS(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        F.size(ws).alias("n_tokens"),
        F.size(F.array_distinct(ws)).alias("n_types"),
        # unrounded exact-integer ratios (registry rule: a final round()
        # diverges between engines on print-boundary doubles)
        (F.size(F.array_distinct(ws)).cast("double") / F.size(ws)).alias("ttr"),
        F.length("text").alias("n_chars_computed"),
        (F.length("text").cast("double") / F.size(ws)).alias("chars_per_token"),
    ).orderBy("doc_id")


@query(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_chars_div4
    FROM documents ORDER BY doc_id
    """,
    survey_ref="X4",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count estimators: whitespace, BPE-ish regex pieces (letter runs /
    digit runs / single punctuation), and the chars/4 heuristic."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_WORDS(F.col("text"))).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_bpe_ish"),
        F.ceil(F.length("text") / 4.0).alias("n_chars_div4"),
    ).orderBy("doc_id")


@query(
    "text_langid",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    scored AS (
      SELECT doc_id, lang,
             {_hits_sql('ws', _LANG_MARKERS['en'])} AS s_en,
             {_hits_sql('ws', _LANG_MARKERS['de'])} AS s_de,
             {_hits_sql('ws', _LANG_MARKERS['fr'])} AS s_fr
      FROM toks
    )
    SELECT doc_id, lang AS lang_meta,
           CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred,
           s_en, s_de, s_fr
    FROM scored ORDER BY doc_id
    """,
    survey_ref="X4",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: per-language hit counts + argmax
    (ties break en > de > fr, mirrored exactly in the oracle)."""
    d = load_table(spark, sf_dir, "documents")
    ws = _WORDS(F.col("text"))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        _hits(ws, _LANG_MARKERS["en"]).alias("s_en"),
        _hits(ws, _LANG_MARKERS["de"]).alias("s_de"),
        _hits(ws, _LANG_MARKERS["fr"]).alias("s_fr"),
    )
    return scored.select(
        "doc_id",
        "lang_meta",
        F.when(
            (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en"
        )
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
        .alias("lang_pred"),
        "s_en",
        "s_de",
        "s_fr",
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id, string_split(text, ' ') AS ws, length(text) AS n_ch
      FROM documents
    ), scored AS (
      SELECT doc_id,
             len(ws) AS n_tokens,
             CAST(len(list_filter(ws, w -> list_contains(['the','a'], w)))
                  AS DOUBLE) / len(ws) AS stopword_ratio,
             CAST(n_ch - len(ws) + 1 AS DOUBLE) / len(ws) AS mean_word_len,
             CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS distinct_ratio
      FROM feats
    )
    SELECT doc_id, n_tokens, stopword_ratio, mean_word_len, distinct_ratio,
           CASE WHEN n_tokens >= 20 AND distinct_ratio >= 0.2
                 AND mean_word_len BETWEEN 2 AND 12 THEN 1 ELSE 0 END AS keep
    FROM scored ORDER BY doc_id
    """,
    survey_ref="X4",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: stopword ratio, mean word length, distinct ratio →
    keep/drop flag (the C4/Gopher-rule shape of LLM corpus filtering)."""
    d = load_table(spark, sf_dir, "documents")
    ws = _WORDS(F.col("text"))
    n_tokens = F.size(ws)
    stop = F.array(F.lit("the"), F.lit("a"))
    scored = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        # unrounded exact-integer ratios (see text_token_stats note) — the
        # keep-thresholds then compare the identical double on both engines
        (
            F.size(F.filter(ws, lambda w: F.array_contains(stop, w))).cast("double")
            / n_tokens
        ).alias("stopword_ratio"),
        ((F.length("text") - n_tokens + 1).cast("double") / n_tokens).alias(
            "mean_word_len"
        ),
        (F.size(F.array_distinct(ws)).cast("double") / n_tokens).alias(
            "distinct_ratio"
        ),
    )
    return scored.withColumn(
        "keep",
        F.when(
            (F.col("n_tokens") >= 20)
            & (F.col("distinct_ratio") >= 0.2)
            & F.col("mean_word_len").between(2, 12),
            1,
        ).otherwise(0),
    ).orderBy("doc_id")


@query(
    "text_ngram_tf",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS ws FROM documents),
    grams AS (
      SELECT unnest(list_transform(range(1, greatest(len(ws), 1)),
                    i -> ws[i] || ' ' || ws[i+1])) AS gram
      FROM toks
    )
    SELECT gram, count(*) AS tf
    FROM grams GROUP BY gram
    ORDER BY tf DESC, gram LIMIT 50
    """,
    survey_ref="X4",
)
def text_ngram_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram term frequency, top 50 — explode + wordcount shape.
    Map-side partial aggregation collapses the shuffle to |vocab|² keys."""
    d = spread(load_table(spark, sf_dir, "documents"), spark)
    ws = _WORDS(F.col("text"))
    # zip_with over shifted slices (not element_at indexing) — see
    # curation.word_ngrams for the codegen-size rationale.
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(ws, 1, n1),
        F.slice(ws, 2, n1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return (
        d.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("gram"))
        .limit(50)
    )


_FP_MOD = 1_000_000_007
_FP_MULT = 131


@query(
    "text_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split(text, ' '), t -> t <> ''),
               t -> (ord(t) * 31 + length(t)) % {_FP_MOD}) AS vals
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(vals) = 0 THEN NULL
                ELSE list_reduce(vals, (acc, x) -> (acc * {_FP_MULT} + x) % {_FP_MOD})
           END AS fingerprint
    FROM toks ORDER BY doc_id
    """,
    survey_ref="X4",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint over token features
    (first-char codepoint, length) mod 1e9+7 — engine-portable integer math;
    DuckDB list_reduce seeds with the first element, mirrored here by folding
    aggregate() over the tail with vals[0] as the initial accumulator."""
    d = load_table(spark, sf_dir, "documents")
    # empty tokens are dropped BEFORE hashing on both sides: Spark's
    # ascii('') is 0 but DuckDB's ord('') is -1 (and its % keeps the sign),
    # so an empty token — any double/leading/trailing space — would give
    # divergent fingerprints (round-5 review; latent in the clean fixture)
    vals = F.transform(
        F.filter(_WORDS(F.col("text")), lambda t: t != ""),
        lambda t: (F.ascii(t) * 31 + F.length(t)) % _FP_MOD,
    )
    # empty/all-whitespace doc → vals = [] → NULL fingerprint on both sides
    # (ANSI element_at([], 1) throws; DuckDB list_reduce([]) errors — the
    # guard is what makes the empty-token filter above safe, round-5 advice)
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("long"),
        lambda acc, x: (acc * _FP_MULT + x) % _FP_MOD,
    )
    return d.select(
        "doc_id",
        F.when(F.size(vals) == 0, F.lit(None).cast("long"))
        .otherwise(fold)
        .alias("fingerprint"),
    ).orderBy("doc_id")


@query(
    "text_fuzzy_levenshtein",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    ORDER BY edit_dist, name_a, name_b
    """,
    survey_ref="F5 (string similarity), X2 (fuzzy entity matching)",
)
def text_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: all name pairs within edit distance 6
    (Spark `levenshtein` == DuckDB `levenshtein`, both Wagner-Fischer).

    Self-join on a *dimension* table, so the pair space is |dim|², not
    |fact|² — Spark broadcasts one side (25 rows) and the distance runs
    JVM-side inside the join condition. At 100 TB the same op over a large
    entity table needs a blocking key first (e.g. soundex/first-k-chars
    bucket, or the MinHash bands of `dedup_minhash_lsh`) so the quadratic
    stays within buckets; the per-pair scoring plan is unchanged."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    a = n.alias("a")
    b = n.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(F.broadcast(b), F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 6)
        .orderBy("edit_dist", "name_a", "name_b")
    )

@query(
    "text_repetition_profile",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ), w AS (
      SELECT doc_id, unnest(ws) AS word FROM toks
    ), c AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
      FROM w GROUP BY doc_id, word
    ), p AS (
      SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(max(cnt) AS BIGINT) AS top_cnt,
             CAST(coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0) AS BIGINT)
               AS dup_tokens
      FROM c GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(p.top_cnt AS DOUBLE) / p.n_tokens AS top_word_share,
           CAST(p.dup_tokens AS DOUBLE) / p.n_tokens AS dup_token_frac
    FROM toks t LEFT JOIN p USING (doc_id)
    ORDER BY doc_id
    """,
    survey_ref="X4e (repetition signals: Gopher-style quality filter inputs)",
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals — the Gopher/FineWeb quality-filter
    inputs that catch boilerplate and degenerate generations: most-frequent-
    token share (top_word_share) and the fraction of tokens belonging to a
    word that repeats (dup_token_frac). High values on either are the
    canonical drop signals for template pages and stuck-decoder text.
    Complements text_repetition_score (curation.py), which thresholds
    per-SOURCE bigram repetition — this is the per-DOCUMENT word-level
    profile a filter inspects before dropping individual rows.

    Shape: explode -> wordcount on (doc_id, word) -> per-doc fold -> left
    join back onto the doc spine so token-less documents survive with
    n_tokens=0 and NULL shares (ANSI-safe: no 0/0). Both shuffles carry
    (id, word-key, count) longs, never the text; the spine join is on
    doc_id only. Ratios are exact-integer divisions emitted unrounded
    (registry rulebook) — bit-identical in both engines."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(_WORDS(F.col("text")), lambda w: w != "").alias("ws"),
    )
    counts = (
        d.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    prof = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.max("cnt").cast("long").alias("top_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("dup_tokens"),
    )
    return (
        d.select("doc_id")
        .join(prof, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias(
                "top_word_share"
            ),
            (F.col("dup_tokens").cast("double") / F.col("n_tokens")).alias(
                "dup_token_frac"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "text_bpe_merge_pairs",
    oracle="""
    WITH words AS (
      SELECT x AS w, CAST(count(*) AS BIGINT) AS freq
      FROM documents,
           unnest(list_filter(string_split(coalesce(text, ''), ' '),
                              y -> y <> '')) AS t(x)
      GROUP BY x
    ), pairs AS (
      SELECT w, freq, substring(w, CAST(i AS INT), 2) AS pair
      FROM words, unnest(range(1, length(w))) AS u(i)
      WHERE length(w) >= 2
    )
    SELECT pair,
           CAST(sum(freq) AS BIGINT) AS pair_count,
           CAST(count(DISTINCT w) AS BIGINT) AS n_word_types
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 30
    """,
    survey_ref="X4g (tokenizer induction: BPE merge-candidate pair census)",
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-induction statistics — the first iteration of BPE training
    (Sennrich et al. 2016) as a distributed job: count every adjacent
    symbol pair across the corpus, weighted by word frequency; the top
    pair is the first merge a BPE trainer would apply. Symbols start as
    characters, so pairs are 2-char substrings; later iterations re-run
    the same plan over re-segmented symbol arrays — identical shape.

    Counting semantics match the reference BPE trainer: a pair occurring
    k times inside one word contributes k x freq (overlaps included —
    'aaa' yields 'aa' twice), and ties at the cut rank are broken by the
    pair string, so the merge choice is deterministic on both engines.

    Shape (100 TB): the classic two-stage wordcount. Stage 1 shuffles the
    word VOCABULARY (not the corpus — map-side partial_count collapses
    repeats before the exchange); stage 2 explodes each vocabulary entry
    into len-1 pairs and shuffles (pair, long) where the pair key space is
    bounded by |alphabet|^2 — tiny. Final top-30 is a TakeOrdered, no
    global sort. No text column ever enters an exchange wider than the
    vocabulary, and nothing touches the driver but 30 rows."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.filter(
                    F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    pairs = words.filter(F.length("w") >= 2).select(
        "w",
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substr("w", i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").cast("long").alias("pair_count"),
            F.countDistinct("w").cast("long").alias("n_word_types"),
        )
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(30)
    )
