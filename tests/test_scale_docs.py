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
