"""Pins for the bench-regression gate's cross-boot calibration logic
(r10 verdict task 4). Pure-subprocess tests over synthetic BENCH_DETAIL
files — no Spark session.

The contract under test: when two runs come from DIFFERENT boots and
both carry the deterministic CPU probe (boot.calib_sec), new-side times
are divided by the probe ratio before classification, so

  * uniform host-speed drift (every query AND the probe inflate
    together) must classify clean — r10's 1.23x cross-boot inflation
    produced 0 useful signal either way;
  * a REAL uniform regression (queries inflate, probe does not — e.g. a
    bad session conf) must still fail — the hole the probe closes;
  * same-boot comparisons are NEVER normalized (a same-machine slowdown
    is always signal).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GATE = REPO / "scripts" / "bench_regress.py"


def _run(tmp_path: Path, old: dict, new: dict) -> tuple[int, dict]:
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    r = subprocess.run(
        [sys.executable, str(GATE), str(po), str(pn)],
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    return r.returncode, json.loads(r.stdout)


def _detail(times: dict[str, float], boot_id: str, calib: float | None) -> dict:
    boot: dict = {"boot_id": boot_id}
    if calib is not None:
        boot["calib_sec"] = calib
    return {
        "sf": 0.1,
        "value": round(sum(times.values()), 3),
        "queries": dict(times),
        "queries_minmax": {k: [v, v * 1.1] for k, v in times.items()},
        "boot": boot,
    }


OLD = _detail({"q1": 1.0, "q2": 2.0}, "boot-A", 1.0)


def test_uniform_cross_boot_drift_normalizes_clean(tmp_path):
    # 2.5x slower host: every query and the probe inflate together.
    # 2.5 > NOISE_FACTOR * 1.1, so WITHOUT the probe this would flag.
    new = _detail({"q1": 2.5, "q2": 5.0}, "boot-B", 2.5)
    rc, s = _run(tmp_path, OLD, new)
    assert rc == 0 and s["n_regressions"] == 0
    assert s["calib"]["ratio"] == 2.5
    assert "normalized" in s["boot_note"] or "divided" in s["boot_note"]


def test_real_regression_survives_cross_boot_normalization(tmp_path):
    # queries 3x but the probe says the host is the SAME speed
    new = _detail({"q1": 3.0, "q2": 6.0}, "boot-B", 1.0)
    rc, s = _run(tmp_path, OLD, new)
    assert rc == 1 and sorted(s["regressions"]) == ["q1", "q2"]


def test_same_boot_never_normalized(tmp_path):
    # same boot id: even a probe claiming 3x slower must not excuse it
    new = _detail({"q1": 3.0, "q2": 6.0}, "boot-A", 3.0)
    rc, s = _run(tmp_path, OLD, new)
    assert rc == 1 and s["n_regressions"] == 2
    assert "calib" not in s


def test_missing_probe_falls_back_to_warning(tmp_path):
    new = _detail({"q1": 1.05, "q2": 2.1}, "boot-B", None)
    rc, s = _run(tmp_path, OLD, new)
    assert rc == 0
    assert "calib" not in s
    assert "drift" in s.get("boot_note", "")


def test_calib_version_mismatch_skips_normalization(tmp_path):
    # v1 probes timed a cold JVM, v2 warms the plan first: a cross-boot
    # v1/v2 ratio mixes JIT compilation with host speed, so the gate
    # must fall back to the boot_note warning instead of normalizing
    old = _detail({"q1": 1.0, "q2": 2.0}, "boot-A", 1.0)
    new = _detail({"q1": 2.5, "q2": 5.0}, "boot-B", 2.5)
    new["boot"]["calib_version"] = 2
    rc, s = _run(tmp_path, old, new)
    assert "calib" not in s
    assert "drift" in s.get("boot_note", "")
    assert rc == 1  # un-normalized 2.5x growth fails, as it should


def test_watch_tier_reports_without_failing(tmp_path):
    # q1 grows to 1.9 vs old_max 1.1 (1.73x): past the 1.5x watch line,
    # under the 2x fail line — must pass the gate but land in `watch`,
    # never silently (r11's multimodal_arrow_map at 1.80x was invisible)
    new = _detail({"q1": 1.9, "q2": 2.0}, "boot-A", 1.0)
    rc, s = _run(tmp_path, OLD, new)
    assert rc == 0 and s["n_regressions"] == 0
    assert s["n_watch"] == 1 and "q1" in s["watch"]
    assert s["watch"]["q1"]["growth"] == round(1.9 / 1.1, 3)


def test_under_watch_line_stays_silent(tmp_path):
    # 1.4x the old ceiling: below WATCH_FACTOR — neither tier fires
    new = _detail({"q1": 1.5, "q2": 2.0}, "boot-A", 1.0)
    rc, s = _run(tmp_path, OLD, new)
    assert rc == 0 and s["n_regressions"] == 0 and s["n_watch"] == 0


def test_watch_abs_floor_guards_subsecond_jitter(tmp_path):
    # 1.8x growth but only +0.08 s absolute: under ABS_FLOOR_SEC — a
    # sub-100ms query's scheduler jitter must not page anyone
    old = _detail({"q1": 0.09, "q2": 2.0}, "boot-A", 1.0)
    new = _detail({"q1": 0.179, "q2": 2.0}, "boot-A", 1.0)
    rc, s = _run(tmp_path, old, new)
    assert rc == 0 and s["n_watch"] == 0 and s["n_regressions"] == 0
