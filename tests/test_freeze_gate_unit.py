"""Unit pins for the freeze gate's round-7 binding change: the green
record hashes the STAGED index, and record mode must DETECT working-tree
divergence from the index under the protected surface (the verify-vs-
record gap the round-7 self-review closed). Pure function-level tests —
no gate subprocess, no Spark. The probes run against a THROWAWAY git repo
in tmp_path (ADVICE r7: the old version wrote scratch files into the live
onebrc_spark/ package, which a killed run left behind — making record mode
refuse — and concurrent workers could race on the shared path)."""

from __future__ import annotations

import importlib.util
import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_freeze_check():
    spec = importlib.util.spec_from_file_location(
        "freeze_check", REPO / "scripts" / "freeze_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tmp_repo(tmp_path: Path) -> Path:
    repo = tmp_path / "repo"
    (repo / "onebrc_spark").mkdir(parents=True)
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    (repo / "onebrc_spark" / "mod.py").write_text("x = 1\n")
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    return repo


def test_tree_hash_is_stable_and_index_bound(tmp_path):
    fc = _load_freeze_check()
    fc.REPO = _tmp_repo(tmp_path)
    h1, h2 = fc.tree_hash(), fc.tree_hash()
    assert h1 == h2
    assert re.fullmatch(r"[0-9a-f]{16}", h1)
    # an UNTRACKED scratch file must not move the staged hash (the old
    # working-tree hash spuriously invalidated greens on stray files)
    (fc.REPO / "onebrc_spark" / "_scratch.py").write_text("# scratch\n")
    assert fc.tree_hash() == h1, "untracked file changed the INDEX hash"
    # ... but a STAGED content change must
    (fc.REPO / "onebrc_spark" / "mod.py").write_text("x = 2\n")
    subprocess.run(["git", "add", "-A"], cwd=fc.REPO, check=True)
    assert fc.tree_hash() != h1, "staged edit did not move the INDEX hash"


def test_unstaged_detection_sees_divergence_from_index(tmp_path):
    fc = _load_freeze_check()
    fc.REPO = _tmp_repo(tmp_path)
    assert fc._unstaged_changes() == ""
    # untracked file under the protected surface → detected
    scratch = fc.REPO / "onebrc_spark" / "_scratch.py"
    scratch.write_text("# scratch\n")
    assert "_scratch.py" in fc._unstaged_changes(), (
        "record mode would have verified a working tree that diverges "
        "from the index without noticing"
    )
    scratch.unlink()
    # unstaged EDIT of a tracked file → detected
    (fc.REPO / "onebrc_spark" / "mod.py").write_text("x = 3\n")
    assert "mod.py" in fc._unstaged_changes()
    subprocess.run(["git", "add", "-A"], cwd=fc.REPO, check=True)
    assert fc._unstaged_changes() == ""


def test_unstaged_probe_fails_closed_outside_git(tmp_path):
    """ADVICE r7: a failed git probe must raise (refusing to record), not
    return empty — an empty return on error silently reopens the
    verify-vs-record gap."""
    fc = _load_freeze_check()
    bare = tmp_path / "not_a_repo"
    bare.mkdir()
    fc.REPO = bare
    with pytest.raises(subprocess.CalledProcessError):
        fc._unstaged_changes()
