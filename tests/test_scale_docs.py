"""Consumer of the two-point (1x/10x) LLM-family scale artifact
(VERDICT r6 #4). scripts/docs_scale_run.py writes SCALE_DOCS.json; this
test pins the measured claim: every headline text/dedup operator scales
at worst linearly in corpus size (char-normalized super-linearity ≤ 1.3 —
the VERDICT pass bar), and the structure-preserving fixture did its job
(the verified pair set lands within banded-LSH recall tolerance of
exactly 10x). A regeneration that turns super-linear fails here by name.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

EXPECTED_QUERIES = {
    "dedup_minhash_lsh",
    "text_boilerplate_segments",
    "text_bpe_merge_pairs",
    "dedup_cluster_components",
}


def test_scale_docs_superlinearity_within_bar():
    path = REPO / "SCALE_DOCS.json"
    assert path.exists(), (
        "SCALE_DOCS.json missing — run scripts/docs_scale_run.py once per "
        "round (builds the 10x corpus under /tmp and measures 1x vs 10x)"
    )
    doc = json.loads(path.read_text())
    assert EXPECTED_QUERIES <= set(doc["queries"]), doc["queries"].keys()
    assert doc["docs_10x"] == 10 * doc["docs_1x"]
    over = {
        name: q["superlinearity_chars"]
        for name, q in doc["queries"].items()
        if q["superlinearity_chars"] > 1.3
    }
    assert not over, f"super-linear at 10x (char-normalized > 1.3): {over}"
    pairs = doc["queries"]["dedup_minhash_lsh"]
    drift = abs(
        pairs["result_rows_10x"] - 10 * pairs["result_rows_1x"]
    ) / max(1, 10 * pairs["result_rows_1x"])
    assert drift < 0.05, (
        f"pair-set drift {drift:.1%} — the replica bijection no longer "
        f"preserves near-dup structure"
    )


def test_scale_docs_similarity_family():
    """The similarity rows (VERDICT r8 #6), measured over the replica
    EMBEDDINGS corpus (per-replica cyclic coordinate shift — within-replica
    cosines bit-preserved, cross-replica cosines decorrelated):

      - sim_ann_ivf_sampled is linear BY DESIGN (fixed-m fit, linear cell
        assignment, |Q|-bounded audit): held to the 1.3 bar, and its output
        must stay exactly |Q| rows at any scale.
      - sim_ann_lsh_banded at FIXED rows_per_band is recorded but not
        barred: on a near-uniform corpus its candidate/output mass grows
        ~quadratically (measured: ~100x pairs at 10x docs) — that is the
        WORKLOAD on random data, and exactly why banded_lsh_buckets' design
        rule deepens bands with log2(N). The rows-ADAPTED variant
        (12 → 15 at 10x, restoring ~1x bucket occupancy) is the scale-path
        number held to the bar."""
    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    emb = doc["embedding_queries"]
    assert {"sim_ann_ivf_sampled", "sim_ann_lsh_banded",
            "sim_ann_lsh_banded_adapted_rows"} <= set(emb), emb.keys()
    ivf = emb["sim_ann_ivf_sampled"]
    assert ivf["result_rows_1x"] == ivf["result_rows_10x"], ivf
    assert ivf["superlinearity_docs"] <= 1.3, ivf
    adapted = emb["sim_ann_lsh_banded_adapted_rows"]
    assert adapted["rows_per_band_10x"] > adapted["rows_per_band_1x"], adapted
    assert adapted["superlinearity_docs"] <= 1.3, adapted


def test_scale_docs_100x_point():
    """The 100x rows (VERDICT r9 #4): the dedup family's two-point
    extrapolation becomes a three-point measurement, and the event family
    gets a data-bound top point (its 1x/10x timings are sub-second, i.e.
    fixed-cost dominated — ADVICE r9). Bars: the vs-1x docs-normalized
    ratio everywhere; the vs-10x ratio additionally wherever the 10x point
    itself cleared the 0.5 s overhead floor."""
    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    assert doc["docs_100x"] == 100 * doc["docs_1x"]
    q100 = doc["queries_100x"]
    assert {"dedup_minhash_lsh", "dedup_cluster_components"} <= set(q100)
    e100 = doc["event_queries_100x"]
    assert {"join_asof", "evt_anomaly_mad", "evt_gap_fill_locf"} <= set(e100)
    for name, q in {**q100, **e100}.items():
        assert q["superlinearity_docs_vs_1x"] <= 1.3, (name, q)
        if not q["low_point_overhead_dominated"]:
            assert q["superlinearity_vs_10x"] <= 1.3, (name, q)
    pairs = q100["dedup_minhash_lsh"]
    base = doc["queries"]["dedup_minhash_lsh"]
    drift = abs(
        pairs["result_rows_100x"] - 100 * base["result_rows_1x"]
    ) / (100 * base["result_rows_1x"])
    assert drift < 0.05, (
        f"100x pair-set drift {drift:.1%} — the second-level bijection no "
        f"longer preserves near-dup structure"
    )
    # similarity family at 100x (VERDICT r10 #4): the family whose
    # candidate-pair growth is the 100 TB risk. Same bars; plus the IVF
    # audit must stay |Q|-row-bounded and the banded pair set must track
    # the sign-flip bijection's exact-100x structure (5% recall tolerance).
    s100 = doc["embedding_queries_100x"]
    assert {"sim_ann_ivf_sampled", "sim_ann_lsh_banded_adapted_rows"} <= set(
        s100
    ), s100.keys()
    for name, q in s100.items():
        assert q["superlinearity_docs_vs_1x"] <= 1.3, (name, q)
        if not q["low_point_overhead_dominated"]:
            assert q["superlinearity_vs_10x"] <= 1.3, (name, q)
    ivf = doc["embedding_queries"]["sim_ann_ivf_sampled"]
    assert s100["sim_ann_ivf_sampled"]["result_rows_100x"] == (
        ivf["result_rows_1x"]
    ), "IVF audit output must stay |Q|-row-bounded at 100x"
    ab = doc["embedding_queries"]["sim_ann_lsh_banded_adapted_rows"]
    a100 = s100["sim_ann_lsh_banded_adapted_rows"]
    assert a100["rows_per_band_100x"] > ab["rows_per_band_10x"], (
        "the rows ≈ log2(N) + c design rule must deepen bands again at 100x"
    )
    # NO docs-style pair-drift assert here: at cos_min=0.30 in 64 dims,
    # cross-replica background pairs (~0.8% of vector pairs for ANY
    # orthogonal replica transform — cos std is 1/sqrt(64)) are inherent
    # to the threshold semantics, so output mass grows ~N^2*P and only
    # the TIME ratio is the scale claim (see scripts/docs_scale_run.py).
    assert a100["result_rows_100x"] > ab["result_rows_10x"], (a100, ab)
    # text-curation family at 100x (VERDICT r11 #4): the boilerplate df
    # census and the BPE pair explode — char-dominated kernels, so the bar
    # rides the char-normalized ratio like their 10x rows; output shape
    # must stay corpus-size-invariant (per-source ledger / LIMIT top-k),
    # which is the no-cross-replica-interaction witness.
    t100 = doc["text_queries_100x"]
    assert {"text_boilerplate_segments", "text_bpe_merge_pairs"} <= set(
        t100
    ), t100.keys()
    for name, q in t100.items():
        assert q["superlinearity_chars_vs_1x"] <= 1.3, (name, q)
        if not q["low_point_overhead_dominated"]:
            assert q["superlinearity_vs_10x"] <= 1.3, (name, q)
        assert (
            q["result_rows_100x"]
            == doc["queries"][name]["result_rows_1x"]
        ), (name, q)


def test_scale_docs_event_family():
    """The eventtime/join rows (r9), measured over the replica EVENTS
    corpus (user_id/event_id stride-remapped, sequences verbatim per
    replica — 10x users carrying exactly 10x work, no cross-replica term):
    the union+window as-of join, the grouped-exact-median MAD scorer and
    the scaffold+LOCF gap fill are all held to the 1.3 bar, with the
    fixture's no-interaction property asserted via exact output scaling
    (10x rows for the per-user queries, identical rows for the per-type
    aggregate)."""
    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    evt = doc["event_queries"]
    assert {"join_asof", "evt_anomaly_mad", "evt_gap_fill_locf"} <= set(evt), (
        evt.keys()
    )
    for name, q in evt.items():
        assert q["superlinearity_docs"] <= 1.3, (name, q)
        # ADVICE r9: all three 1x timings sit below the fixed-cost floor,
        # so the bar above is vacuous for them — the artifact must SAY so
        # (overhead_dominated), and the real scaling bar lives in
        # test_scale_docs_100x_point over the data-bound 100x rows.
        assert "overhead_dominated" in q, (name, q)
    assert (
        evt["join_asof"]["result_rows_10x"]
        == 10 * evt["join_asof"]["result_rows_1x"]
    ), evt["join_asof"]
    assert (
        evt["evt_gap_fill_locf"]["result_rows_10x"]
        == 10 * evt["evt_gap_fill_locf"]["result_rows_1x"]
    ), evt["evt_gap_fill_locf"]
    assert (
        evt["evt_anomaly_mad"]["result_rows_10x"]
        == evt["evt_anomaly_mad"]["result_rows_1x"]
    ), evt["evt_anomaly_mad"]


def test_scale_docs_recall_audit_structure():
    """The banded-recall story at both scales, from the REGISTERED audit
    query (dedup_minhash_recall_audit): 'strong' (J >= 0.9) pairs must
    essentially all band-collide, 'sub' (J < 0.7) pairs must essentially
    all be pruned — the two ends of the 4x3 s-curve. 'borderline' recall
    is shingle-hash-space dependent (the per-replica token bijection
    changes it), so it is BOUNDED (>= 600k ppm, i.e. at most one miss in
    the small borderline class), never pinned exactly — the
    oracle-divergence rulebook's cross-corpus-recall caveat."""
    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    ra = doc["recall_audit"]
    for scale in ("1x", "10x"):
        classes = ra[scale]
        for cls, v in classes.items():
            assert 0 <= v["n_found"] <= v["n_truth"], (scale, cls, v)
        assert classes["strong"]["recall_ppm"] >= 990_000, (scale, classes)
        if "sub" in classes:
            assert classes["sub"]["recall_ppm"] <= 300_000, (scale, classes)
        if "borderline" in classes:
            assert classes["borderline"]["recall_ppm"] >= 600_000, (
                scale,
                classes,
            )
    # Truth structure scales with the bijection APPROXIMATELY: the token
    # suffixes preserve Jaccard exactly but inflate n_chars, and the truth
    # join blocks on n_chars // 100 — so some within-replica pairs shift
    # length-buckets and drop out of the BLOCKED truth (measured: strong
    # 713 vs 740 at 10x). Bound the drift instead of pinning 10x.
    s1, s10 = ra["1x"]["strong"]["n_truth"], ra["10x"]["strong"]["n_truth"]
    assert abs(s10 - 10 * s1) / (10 * s1) < 0.10, (s1, s10)


def test_scale_docs_containment():
    """X2c three-point rows (VERDICT r12 #2): the token bijection is EXACT
    for containment (literal word-3-grams, no hashing anywhere in the
    plan), so the pair set must be EXACTLY kx — any deviation means the
    fixture interacted across replicas. Bars as usual; plus the hot-gram
    stress corpus (one gram with df = 20,000 >> cap 64 over 20k injected
    one-gram docs): the census-bounded plan must return the base corpus's
    exact pair set (the hot gram is excluded, never joined) at a cost
    bounded by the 10x corpus run — the pre-r12 posting-list plan would
    have buffered C(20000,2) ~ 2.0e8 candidate pairs on that one gram."""
    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    c = doc["containment"]
    assert c["result_rows_1x"] > 0, c
    assert c["result_rows_10x"] == 10 * c["result_rows_1x"], c
    assert c["result_rows_100x"] == 100 * c["result_rows_1x"], c
    assert c["superlinearity_docs_10x_vs_1x"] <= 1.3, c
    assert c["superlinearity_docs_vs_1x"] <= 1.3, c
    if not c["low_point_overhead_dominated"]:
        assert c["superlinearity_vs_10x"] <= 1.3, c
    hs = c["hot_gram_stress"]
    assert hs["result_rows"] == c["result_rows_1x"], hs
    assert hs["hot_gram_df"] > 100 * hs["df_cap"], hs
    assert hs["sec"] <= c["sec_10x"], (
        "hot-gram corpus (1x + 20k one-gram docs) must cost less than the "
        "10x corpus — the census scan is linear, the buffer is bounded",
        hs,
        c,
    )


def test_scale_docs_recall_100x_truth_sample():
    """The 100x minhash-recall point (VERDICT r12 #3, text side), via the
    deployable audit-on-a-sample shape: truth restricted to replicas
    {0, 43} (one verbatim vocabulary, one doubly-suffixed), candidates
    from the FULL 100x production pipeline. Bar: borderline recall at
    least the 10x measured value (933,333 ppm — the number the r12
    VERDICT set as the floor), strong near-total, sub near-zero."""
    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    ra = doc["recall_audit"]
    s = ra["100x_truth_sample"]
    assert s["truth_replicas"] == [0, 43], s
    classes = s["classes"]
    assert classes["strong"]["recall_ppm"] >= 990_000, classes
    assert classes["sub"]["recall_ppm"] <= 300_000, classes
    assert (
        classes["borderline"]["recall_ppm"]
        >= ra["10x"]["borderline"]["recall_ppm"]
    ), (classes, ra["10x"])


def test_scale_docs_ann_recall_adapted_matches_scurve():
    """The banded-ANN recall/cost frontier (VERDICT r12 #3): recall of the
    rows-ADAPTED (12/15/19) banded candidate generator vs exact truth at
    cos >= 0.30. The measured borderline recall is LOW and FALLS with
    rows — ~0.95% / 0.29% / 0.04% — and that is the s-curve, not a
    defect: sign-LSH band collision for cosine c is
    p(c) = (1 - acos(c)/pi)^rows per band, so at c = 0.30
    (p_bit = 0.597) four bands give 4*0.597^rows ~ 8200 / 1750 / 220 ppm
    for rows 12/15/19 — the adapted setting's s-curve midpoint sits near
    c ~ 0.97: it is a NEAR-DUP detector with bounded candidate mass on a
    near-uniform corpus, not a cos>=0.3 retriever (that retrieval regime
    is the audit's own 4x3 banding and the IVF/kNN paths; the text twin's
    retrieval-grade recall is pinned by the tests above). The pin here:
    measured ppm must track the analytic s-curve (within [0.5x, 10x] —
    truth pairs spread above 0.30, so measured modestly EXCEEDS the
    at-threshold prediction), and rows_per_band must deepen with scale."""
    import math

    doc = json.loads((REPO / "SCALE_DOCS.json").read_text())
    ann = doc["ann_recall_adapted"]
    p_bit = 1 - math.acos(ann["threshold"]) / math.pi
    last_rows = 0
    for scale in ("1x", "10x", "100x"):
        blk = ann[scale]
        rows = blk["rows_per_band"]
        assert rows > last_rows or scale == "1x", (scale, rows, last_rows)
        last_rows = rows
        predicted_ppm = 4 * (p_bit ** rows) * 1_000_000
        measured = blk["borderline"]["recall_ppm"]
        assert 0.5 * predicted_ppm <= measured <= 10 * predicted_ppm, (
            scale,
            rows,
            predicted_ppm,
            measured,
        )
