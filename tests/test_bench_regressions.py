"""bench.py's self-reporting perf-regression gate.

Supersedes eyeball drift-detection across the driver's per-round
``BENCH_r*.json`` artifacts (the harness that replaced reference
``predict.py:425-448``): every reported channel is compared against the
best prior round within the documented variance band, and the JSON line
carries a ``regressions`` field — empty when clean.
"""

import importlib.util
import json
import os

import pytest

from conftest import REPO_ROOT

_spec = importlib.util.spec_from_file_location(
    "ablc_bench", os.path.join(REPO_ROOT, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write_round(d, n, rec, wrapped=True):
    payload = {"n": n, "cmd": "python bench.py", "rc": 0,
               "parsed": rec} if wrapped else rec
    with open(os.path.join(d, f"BENCH_r{n:02d}.json"), "w") as f:
        json.dump(payload, f)


GOOD = {
    "metric": "cutoffvgg16_clip_inference", "value": 21000.0,
    "unit": "frames/sec", "train_frames_per_sec": 10000.0,
    "train_phases": {"extract": {"frames_per_sec": 13000.0},
                     "finetune": {"frames_per_sec": 10000.0}},
    "gradcam_frames_per_sec": 20000.0, "latency_ms_batch1": 0.13,
}


def test_channels_extraction():
    ch = bench._channels(GOOD)
    assert ch["serve"] == (21000.0, True)
    assert ch["train_extract"] == (13000.0, True)
    assert ch["latency_batch1"] == (0.13, False)
    # zero/absent channels are omitted, not compared as 0
    assert "gradcam" not in bench._channels({"value": 1.0,
                                             "gradcam_frames_per_sec": 0})


def test_clean_run_reports_no_regressions(tmp_path):
    _write_round(str(tmp_path), 1, GOOD)
    report = dict(GOOD, value=20990.0)  # within the 5% band
    assert bench._regressions(report, bench_dir=str(tmp_path)) == []


def test_regression_detected_against_best_prior(tmp_path):
    _write_round(str(tmp_path), 1, dict(GOOD, value=19000.0))
    _write_round(str(tmp_path), 2, GOOD)  # best round for serve
    report = dict(GOOD, value=18000.0)    # >5% below 21000
    regs = bench._regressions(report, bench_dir=str(tmp_path))
    assert [r["channel"] for r in regs] == ["serve"]
    assert regs[0]["best_prior"] == 21000.0
    assert regs[0]["round"] == "BENCH_r02.json"


def test_latency_regression_is_higher_is_worse(tmp_path):
    _write_round(str(tmp_path), 1, GOOD)
    report = dict(GOOD, latency_ms_batch1=0.2)   # slower than 0.13 + 5%
    regs = bench._regressions(report, bench_dir=str(tmp_path))
    assert [r["channel"] for r in regs] == ["latency_batch1"]
    # and a FASTER latency is never flagged
    report = dict(GOOD, latency_ms_batch1=0.05)
    assert bench._regressions(report, bench_dir=str(tmp_path)) == []


def test_missing_channel_is_flagged(tmp_path):
    _write_round(str(tmp_path), 1, GOOD)
    report = {k: v for k, v in GOOD.items()
              if k != "gradcam_frames_per_sec"}
    regs = bench._regressions(report, bench_dir=str(tmp_path))
    assert [r["channel"] for r in regs] == ["gradcam"]
    assert regs[0]["value"] is None and "missing" in regs[0]["note"]


def test_error_rounds_and_garbage_files_are_skipped(tmp_path):
    _write_round(str(tmp_path), 1, {"value": 99999.0,
                                    "error": "backend unresponsive"})
    with open(os.path.join(str(tmp_path), "BENCH_r02.json"), "w") as f:
        f.write("not json{")
    _write_round(str(tmp_path), 3, GOOD, wrapped=False)  # raw (unwrapped)
    report = dict(GOOD)
    assert bench._regressions(report, bench_dir=str(tmp_path)) == []
    report["value"] = 15000.0
    regs = bench._regressions(report, bench_dir=str(tmp_path))
    assert regs and regs[0]["best_prior"] == 21000.0  # not the error 99999


def test_tolerance_env_override(tmp_path, monkeypatch):
    _write_round(str(tmp_path), 1, GOOD)
    report = dict(GOOD, value=20000.0)  # -4.8%: inside 5%, outside 1%
    assert bench._regressions(report, bench_dir=str(tmp_path)) == []
    monkeypatch.setenv("ABLC_BENCH_REGRESSION_TOL", "0.01")
    regs = bench._regressions(report, bench_dir=str(tmp_path))
    assert [r["channel"] for r in regs] == ["serve"]


def test_no_prior_rounds_is_clean(tmp_path):
    assert bench._regressions(dict(GOOD), bench_dir=str(tmp_path)) == []


def test_repo_bench_history_vs_current_artifacts():
    """The real repo BENCH_r*.json history parses through the gate: a
    synthetic report carrying the per-channel best of every prior round
    must be clean (exercises the real files' two wrapping formats)."""
    import glob

    paths = sorted(glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")))
    assert paths, "driver artifacts missing"
    merged = {}
    for p in paths:
        rec = json.load(open(p))
        rec = rec.get("parsed", rec)
        if rec.get("error"):
            continue
        for name, (value, higher) in bench._channels(rec).items():
            prev = merged.get(name)
            if (prev is None or (higher and value > prev[0])
                    or (not higher and value < prev[0])):
                merged[name] = (value, higher)
    assert "serve" in merged and "latency_batch1" in merged
    report = {
        "value": merged["serve"][0],
        "train_frames_per_sec": merged.get("train", (None,))[0],
        "train_phases": {ph: {"frames_per_sec": merged[f"train_{ph}"][0]}
                         for ph in ("extract", "finetune")
                         if f"train_{ph}" in merged},
        "gradcam_frames_per_sec": merged.get("gradcam", (None,))[0],
        "latency_ms_batch1": merged["latency_batch1"][0],
    }
    assert bench._regressions(report) == []
