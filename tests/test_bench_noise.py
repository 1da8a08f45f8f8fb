"""Unit tests for bench.py's probe-gated noise comparison (VERDICT r9 #1).

The r9 headline artifact was taken on a contended host (spark_probe
0.365-0.487 s vs the ~0.19 s idle floor) and printed 5 phantom regression
flags; nothing gated on the probe. These tests pin the three guards added
in round 10, driver-contract-free (no Spark session — compute_noise_block
is pure given a repo dir of artifacts):

  1. a CONTENDED REFERENCE is skipped in favor of the newest probe-clean
     artifact (the r10-vs-r9 comparison must not normalize against a
     1.6-1.9x inflated denominator);
  2. a CONTENDED CURRENT RUN demotes its regression flags to
     `untrusted_regressions` (load vs regression is indistinguishable);
  3. a reference with NO `sf` key is unknown-scale and skipped (ADVICE r9:
     the same-workload guard previously only fired when ref_sf was present).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench  # noqa: E402

# Samples shaped like run_calibration appends; probe median is the middle.
_CLEAN_SAMPLES = [
    {"cpu_spin_sec": 0.2, "spark_probe_sec": 0.19},
    {"cpu_spin_sec": 0.2, "spark_probe_sec": 0.20},
    {"cpu_spin_sec": 0.2, "spark_probe_sec": 0.21},
]
_CONTENDED_SAMPLES = [
    {"cpu_spin_sec": 0.4, "spark_probe_sec": 0.49},
    {"cpu_spin_sec": 0.3, "spark_probe_sec": 0.37},
    {"cpu_spin_sec": 0.3, "spark_probe_sec": 0.29},
]


def _artifact(path: Path, queries: dict, probe: float | None, sf=0.1, wrap=False):
    doc: dict = {"metric": "m", "value": 1.0, "unit": "sec", "queries": queries}
    if sf is not None:
        doc["sf"] = sf
    if probe is not None:
        doc["calibration"] = {
            "samples": [{"cpu_spin_sec": 0.2, "spark_probe_sec": probe}],
            "cpu_spin_sec": 0.2,
            "spark_probe_sec": probe,
        }
    path.write_text(json.dumps({"parsed": doc} if wrap else doc))


# Ten stable queries so the median ratio is ~1.0 and one real mover flags.
_REF_Q = {f"q{i}": 1.0 for i in range(10)}
_CUR_STABLE = {f"q{i}": 1.0 for i in range(10)}
_CUR_REGRESSED = dict(_CUR_STABLE, q0=3.0)


def test_probe_band_from_recorded_floor(tmp_path):
    _artifact(tmp_path / "BENCH_r01.json", _REF_Q, probe=0.188)
    _artifact(tmp_path / "BENCH_r02.json", _REF_Q, probe=0.365)
    # floor = min recorded (0.188) -> band = max(1.25*0.188, 0.22) = 0.235
    assert bench._probe_band(tmp_path) == 0.235


def test_probe_band_default_when_no_calibration(tmp_path):
    _artifact(tmp_path / "BENCH_r01.json", _REF_Q, probe=None)
    # ADVICE r10: with no calibrated artifacts, the band IS the documented
    # trust ceiling (0.22), not 1.25x it — the multiplier applies only to a
    # measured floor.
    assert bench._probe_band(tmp_path) == bench._PROBE_FLOOR_DEFAULT


def test_probe_band_env_override_rebaselines(tmp_path, monkeypatch):
    """ADVICE r10: min-over-artifacts is a one-way ratchet pinned to the
    fastest host ever recorded — a slower replacement host would be
    permanently demoted. ONEBRC_PROBE_FLOOR replaces the artifact floor."""
    _artifact(tmp_path / "BENCH_r01.json", _REF_Q, probe=0.188)
    monkeypatch.setenv("ONEBRC_PROBE_FLOOR", "0.40")
    assert bench._probe_band(tmp_path) == 0.5  # 1.25 * 0.40, artifact ignored
    monkeypatch.delenv("ONEBRC_PROBE_FLOOR")
    assert bench._probe_band(tmp_path) == 0.235  # back to the recorded floor


def test_contended_reference_skipped_for_older_clean(tmp_path):
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.188)
    _artifact(tmp_path / "BENCH_r09.json", {k: v * 1.7 for k, v in _REF_Q.items()},
              probe=0.365, wrap=True)
    block = bench.compute_noise_block(dict(_CUR_STABLE), list(_CLEAN_SAMPLES),
                                      repo=tmp_path)
    assert block["noise"]["ref"] == "BENCH_r08.json"
    assert block["noise"]["normalized_regressions"] == []
    assert block["calibration"]["contended"] is False


def test_all_references_contended_skips_comparison(tmp_path):
    # Clean fullsweep pins the floor; both headline refs are contended.
    _artifact(tmp_path / "BENCH_r08_fullsweep.json", _REF_Q, probe=0.19)
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.40)
    _artifact(tmp_path / "BENCH_r09.json", _REF_Q, probe=0.37)
    block = bench.compute_noise_block(dict(_CUR_STABLE), list(_CLEAN_SAMPLES),
                                      repo=tmp_path)
    assert "noise" not in block


def test_contended_current_run_demotes_flags(tmp_path):
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    block = bench.compute_noise_block(dict(_CUR_REGRESSED),
                                      list(_CONTENDED_SAMPLES), repo=tmp_path)
    assert block["calibration"]["contended"] is True
    assert block["noise"]["normalized_regressions"] == []
    assert block["noise"]["untrusted_regressions"] == ["q0"]


def test_clean_run_still_flags_real_regressions(tmp_path):
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    block = bench.compute_noise_block(dict(_CUR_REGRESSED),
                                      list(_CLEAN_SAMPLES), repo=tmp_path)
    assert block["calibration"]["contended"] is False
    assert block["noise"]["normalized_regressions"] == ["q0"]
    assert "untrusted_regressions" not in block["noise"]


def test_reference_without_sf_is_unknown_scale(tmp_path):
    # ADVICE r9: a ref missing "sf" used to be compared cross-scale silently.
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19, sf=None)
    block = bench.compute_noise_block(dict(_CUR_REGRESSED),
                                      list(_CLEAN_SAMPLES), repo=tmp_path)
    assert "noise" not in block


def test_cross_scale_reference_skipped(tmp_path):
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19, sf=0.01)
    block = bench.compute_noise_block(dict(_CUR_REGRESSED),
                                      list(_CLEAN_SAMPLES), repo=tmp_path)
    assert "noise" not in block


def _probes(names, clean=True, probe=None):
    p = probe if probe is not None else (0.19 if clean else 0.45)
    return {
        n: {"pre": p, "post": p, "clean": clean, "attempts": 1} for n in names
    }


def test_query_probes_calibrate_from_windows(tmp_path):
    """VERDICT r10 #1 (chunked protocol): with per-query probe stamps, the
    artifact's headline spark_probe_sec / contended come from the windows
    the numbers were actually taken in — a trajectory that flapped BETWEEN
    queries (contended run_calibration samples) no longer poisons numbers
    taken inside clean windows."""
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    qp = _probes(_CUR_STABLE, clean=True)
    block = bench.compute_noise_block(
        dict(_CUR_STABLE), list(_CONTENDED_SAMPLES), repo=tmp_path,
        query_probes=qp,
    )
    assert block["calibration"]["contended"] is False
    assert block["calibration"]["spark_probe_sec"] == 0.19
    assert block["query_probes"] == qp


def test_flag_trusted_iff_its_own_window_clean(tmp_path):
    """Per-query trust: a regression flag on a query timed in a clean
    window survives even when another query's window was contended; a flag
    whose own window was contended is demoted."""
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    cur = dict(_CUR_STABLE, q0=3.0, q1=3.0)
    qp = _probes(cur, clean=True)
    qp["q1"] = {"pre": 0.5, "post": 0.6, "clean": False, "attempts": 3}
    block = bench.compute_noise_block(
        cur, list(_CLEAN_SAMPLES), repo=tmp_path, query_probes=qp
    )
    assert block["noise"]["normalized_regressions"] == ["q0"]
    assert block["noise"]["untrusted_regressions"] == ["q1"]


def test_all_windows_contended_demotes_everything(tmp_path):
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    qp = _probes(_CUR_REGRESSED, clean=False)
    block = bench.compute_noise_block(
        dict(_CUR_REGRESSED), list(_CONTENDED_SAMPLES), repo=tmp_path,
        query_probes=qp,
    )
    assert block["calibration"]["contended"] is True
    assert block["noise"]["normalized_regressions"] == []
    assert block["noise"]["untrusted_regressions"] == ["q0"]


def test_probe_floor_uses_fullsweep_artifacts(tmp_path):
    # The probe is a fixed workload — fullsweep calibrations count for the
    # floor even though they are never noise references.
    _artifact(tmp_path / "BENCH_r09_fullsweep.json", _REF_Q, probe=0.15)
    _artifact(tmp_path / "BENCH_r09.json", _REF_Q, probe=0.30)
    # floor = 0.15 -> band = max(0.1875, 0.22) = 0.22
    assert bench._probe_band(tmp_path) == 0.22


def test_cross_epoch_reference_annotated(tmp_path):
    """r11: probe_ratio and median_ratio moving >=1.5x in opposite
    directions = the reference is from a different host EPOCH (sustained
    throughput shifted while the burst probe did not — the r8-vs-r11
    measured case: probe 0.60x, median 1.36x, r8 TREE re-run reproducing
    the r11-epoch numbers). The artifact must say so."""
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.188)
    cur = {k: v * 1.36 for k, v in _REF_Q.items()}  # uniform epoch shift
    samples = [{"cpu_spin_sec": 0.13, "spark_probe_sec": 0.112}] * 3
    block = bench.compute_noise_block(cur, samples, repo=tmp_path)
    assert block["noise"]["reference_epoch_shift"] is True
    assert block["noise"]["normalized_regressions"] == []  # uniform = no flags


def test_same_epoch_reference_not_annotated(tmp_path):
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    block = bench.compute_noise_block(dict(_CUR_STABLE), list(_CLEAN_SAMPLES),
                                      repo=tmp_path)
    assert "reference_epoch_shift" not in block["noise"]


def test_wait_for_calm_budget_mechanics(monkeypatch):
    """r11 calm-window gate: the poll loop returns immediately on a calm
    probe, drains the SHARED budget while contended (so one stuck window
    cannot starve the rest of the run), and degrades to returning the last
    contended reading once the budget is gone — bench.py must always
    terminate under the driver."""
    readings = iter([0.5, 0.45, 0.12])
    slept = []
    monkeypatch.setattr(bench, "_spark_probe_seconds", lambda s: next(readings))
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    budget = {"left": 100.0}
    probe = bench._wait_for_calm(None, band=0.235, budget=budget)
    assert probe == 0.12 and len(slept) == 2
    assert budget["left"] == 100.0 - sum(slept)

    # exhausted budget: no sleep, first reading returned even if contended
    readings = iter([0.5])
    slept.clear()
    probe = bench._wait_for_calm(None, band=0.235, budget={"left": 0.0})
    assert probe == 0.5 and slept == []

    # budget smaller than one poll: waits only what is left, then returns
    readings = iter([0.5, 0.4])
    slept.clear()
    budget = {"left": 7.0}
    probe = bench._wait_for_calm(None, band=0.235, budget=budget)
    assert probe == 0.4 and slept == [7.0] and budget["left"] == 0.0


def test_same_direction_slowdown_not_annotated_as_epoch(tmp_path):
    """ADVICE r11: median 3.0x slower WITH probe 1.9x slower is a genuine
    broad slowdown plus load, not a cross-epoch artifact — the ratio-only
    condition (probe <= median/1.5) used to fire here and would have
    adjudicated a real regression epoch away. The detector now also
    requires the probe to be near-flat (<=1.1x) on the slow branch."""
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.19)
    cur = {k: v * 3.0 for k, v in _REF_Q.items()}
    samples = [{"cpu_spin_sec": 0.25, "spark_probe_sec": 0.19 * 1.9}] * 3
    block = bench.compute_noise_block(cur, samples, repo=tmp_path)
    assert "reference_epoch_shift" not in block.get("noise", {})


def test_fast_branch_requires_probe_not_slower(tmp_path):
    """Mirror of the slow branch: median 0.5x (host twice as fast) with the
    probe ALSO much faster (0.3x — same direction) is a uniform host
    speedup, not an epoch artifact; the fast branch requires the probe to
    stay >=0.9x. The true opposite-signed case (probe 1.2x slower while
    the median halves) still annotates."""
    _artifact(tmp_path / "BENCH_r08.json", _REF_Q, probe=0.20)
    cur = {k: v * 0.5 for k, v in _REF_Q.items()}
    same_dir = [{"cpu_spin_sec": 0.1, "spark_probe_sec": 0.06}] * 3
    block = bench.compute_noise_block(cur, same_dir, repo=tmp_path)
    assert "reference_epoch_shift" not in block.get("noise", {})
    opposite = [{"cpu_spin_sec": 0.1, "spark_probe_sec": 0.24}] * 3
    block = bench.compute_noise_block(cur, opposite, repo=tmp_path)
    assert block["noise"]["reference_epoch_shift"] is True


def test_gc_adjudicated_post_probe(monkeypatch):
    """VERDICT r11 #3: a contended post-probe whose overage is measured
    in-process GC time gets flushed (System.gc) and re-taken once, with
    the first reading and its GC overlap recorded as evidence; a
    contended reading WITHOUT GC overlap is host load and stands; a clean
    reading never triggers the flush."""
    band = 0.235
    gc_calls = []
    monkeypatch.setattr(bench, "_jvm_system_gc", lambda s: gc_calls.append(1))

    # clean: no flush, no evidence
    monkeypatch.setattr(bench, "_spark_probe_seconds", lambda s: 0.12)
    monkeypatch.setattr(bench, "_jvm_gc_millis", lambda s: 0)
    post, ev = bench._gc_adjudicated_post_probe(None, band)
    assert post == 0.12 and ev is None and not gc_calls

    # contended with GC covering >=50% of the overage: flush + re-probe
    probes = iter([0.32, 0.13])
    gcs = iter([1000, 1070])  # 70 ms GC inside a 85 ms overage
    monkeypatch.setattr(bench, "_spark_probe_seconds", lambda s: next(probes))
    monkeypatch.setattr(bench, "_jvm_gc_millis", lambda s: next(gcs))
    post, ev = bench._gc_adjudicated_post_probe(None, band)
    assert post == 0.13 and gc_calls == [1]
    assert ev == {"first_post": 0.32, "gc_ms_in_first": 70}

    # contended but GC-free: host load — reading stands, no flush
    gc_calls.clear()
    monkeypatch.setattr(bench, "_spark_probe_seconds", lambda s: 0.32)
    gcs = iter([500, 510])  # 10 ms GC << 42.5 ms (half the overage)
    monkeypatch.setattr(bench, "_jvm_gc_millis", lambda s: next(gcs))
    post, ev = bench._gc_adjudicated_post_probe(None, band)
    assert post == 0.32 and ev is None and not gc_calls
