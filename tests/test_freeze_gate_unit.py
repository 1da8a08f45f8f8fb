"""Unit pins for the freeze gate's round-7 binding change: the green
record hashes the STAGED index, and record mode must DETECT working-tree
divergence from the index under the protected surface (the verify-vs-
record gap the round-7 self-review closed). Pure function-level tests —
no gate subprocess, no Spark."""

from __future__ import annotations

import importlib.util
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_freeze_check():
    spec = importlib.util.spec_from_file_location(
        "freeze_check", REPO / "scripts" / "freeze_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tree_hash_is_stable_and_index_bound():
    fc = _load_freeze_check()
    h1, h2 = fc.tree_hash(), fc.tree_hash()
    assert h1 == h2
    assert re.fullmatch(r"[0-9a-f]{16}", h1)
    # an UNTRACKED scratch file must not move the staged hash (the old
    # working-tree hash spuriously invalidated greens on stray files)
    scratch = REPO / "onebrc_spark" / "_freeze_gate_unit_scratch.py"
    try:
        scratch.write_text("# scratch\n")
        assert fc.tree_hash() == h1, "untracked file changed the INDEX hash"
    finally:
        scratch.unlink(missing_ok=True)


def test_unstaged_detection_sees_untracked_protected_files():
    fc = _load_freeze_check()
    scratch = REPO / "onebrc_spark" / "_freeze_gate_unit_scratch.py"
    try:
        scratch.write_text("# scratch\n")
        stray = fc._unstaged_changes()
        assert "_freeze_gate_unit_scratch.py" in stray, (
            "record mode would have verified a working tree that diverges "
            "from the index without noticing"
        )
    finally:
        scratch.unlink(missing_ok=True)
    assert "_freeze_gate_unit_scratch.py" not in fc._unstaged_changes()
