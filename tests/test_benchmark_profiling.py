"""Smoke tests for the benchmark harness and profiling utilities.

These are the round-tracking measurement tools (successors to the
reference's ``clock_avg_runtime``, reference ``src/predict.py:425-448``) —
they must keep running on any backend even though their *numbers* only mean
something on the TPU. Tiny shapes / iteration counts keep this fast on CPU.
"""

import os

import jax
import numpy as np
import pytest

from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.predict.benchmark import (
    clip_inference_benchmark, clock_avg_runtime, dispatch_guarded_seconds,
    training_throughput_benchmark)
from ab_line_classifier_tpu.utils.profiling import StepTimer, annotate, trace

TINY_CNN0 = {"LR": 1e-3, "DROPOUT": 0.35, "L2_LAMBDA": 1e-4,
             "NODES_DENSE0": 8, "KERNEL_SIZE": 3, "STRIDES": 1,
             "MAXPOOL_SIZE": 2, "BLOCKS": 1, "INIT_FILTERS": 4,
             "FILTER_EXP_BASE": 2}


def _tiny_spec(img=(32, 32)):
    return build_model("cnn0", TINY_CNN0, img + (3,), 2,
                       mixed_precision=False)


def test_dispatch_guarded_seconds_trusts_scaling_timer():
    """When elapsed time scales with iteration count (an honest backend),
    the double-count run halved is the steady-state estimate and the
    per-iteration-sync fallback is never invoked."""
    calls = []

    def run_many(iters):
        calls.append(iters)
        return 0.01 * iters  # perfectly linear

    def fallback(iters):
        raise AssertionError("fallback must not run on a scaling timer")

    dt = dispatch_guarded_seconds(run_many, fallback, n_iters=4)
    assert calls == [4, 8]
    assert dt == pytest.approx(0.04)


def test_dispatch_guarded_seconds_falls_back_on_async_underreport():
    """When doubling the iterations does NOT roughly double the elapsed
    time (the backend signalled completion early), the per-iteration-sync
    fallback's measurement is trusted instead."""
    def run_many(iters):
        return 0.01  # constant: async dispatch returned before finishing

    def fallback(iters):
        assert iters == 4
        return 0.5

    dt = dispatch_guarded_seconds(run_many, fallback, n_iters=4)
    assert dt == pytest.approx(0.5)


def test_clock_avg_runtime_smoke():
    spec = _tiny_spec()
    v = spec.init_variables(jax.random.PRNGKey(0))
    mean_ms, std_ms = clock_avg_runtime(n_warmup_runs=1, n_experiment_runs=3,
                                        img_dim=(32, 32), spec=spec,
                                        variables=v, verbose=False)
    assert mean_ms > 0 and std_ms >= 0


def test_single_frame_latency_benchmark_smoke():
    from ab_line_classifier_tpu.predict.benchmark import (
        single_frame_latency_benchmark)

    spec = _tiny_spec()
    v = spec.init_variables(jax.random.PRNGKey(0))
    r = single_frame_latency_benchmark(img_dim=(32, 32), chain_len=4,
                                       n_warmup=1, n_iters=2, spec=spec,
                                       variables=v, verbose=False)
    assert r["ms_per_frame"] > 0
    # chain_len reports the chain actually timed: the requested 4, or 8x
    # that when timing noise trips the per-call-sync fallback (expected
    # on a 1-CPU host with sub-ms chains).
    assert r["chain_len"] in (4, 32)


def test_clip_inference_benchmark_smoke():
    spec = _tiny_spec()
    v = spec.init_variables(jax.random.PRNGKey(0))
    r = clip_inference_benchmark(batch_size=8, img_dim=(32, 32),
                                 n_warmup=1, n_iters=2, spec=spec,
                                 variables=v, verbose=False)
    assert r["frames_per_sec"] > 0
    assert r["batch_size"] == 8
    assert r["ms_per_batch"] > 0


def test_training_throughput_benchmark_smoke():
    r = training_throughput_benchmark(model_name="cnn0", batch_size=8,
                                      img_dim=(32, 32), n_warmup=1,
                                      n_iters=2, verbose=False)
    assert r["train_frames_per_sec"] > 0
    # Per-phase results, each labeled with XLA-counted FLOPs/frame
    # (cnn0 has one phase; top-level keys mirror the last phase).
    assert [p["phase"] for p in r["phases"]] == ["train"]
    assert r["phase"] == "train"
    assert r["phases"][0]["flops_per_frame"] is None or \
        r["phases"][0]["flops_per_frame"] > 0


def test_training_benchmark_phase_filter():
    with pytest.raises(ValueError):
        training_throughput_benchmark(model_name="cnn0", batch_size=8,
                                      img_dim=(32, 32), n_warmup=1,
                                      n_iters=2, phase="nope",
                                      verbose=False)


def test_gradcam_benchmark_smoke():
    from ab_line_classifier_tpu.predict.benchmark import gradcam_benchmark

    r = gradcam_benchmark(model_name="cnn0", batch_size=8, img_dim=(32, 32),
                          n_warmup=1, n_iters=2, verbose=False)
    assert r["gradcam_frames_per_sec"] > 0
    assert r["mode"] == "normal"


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=2)
    for i in range(5):
        with t:
            pass
    assert len(t.times) == 3
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] >= 0 and s["p95_ms"] >= s["p50_ms"]
    assert StepTimer(warmup=2).summary() == {}  # short run -> empty, not lies


def test_trace_context_writes_profile(tmp_path):
    import jax.numpy as jnp

    log_dir = str(tmp_path / "profiles")
    with trace(log_dir):
        with annotate("tiny-matmul"):
            np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # jax.profiler writes a plugins/profile/<ts>/ tree
    found = []
    for root, _, files in os.walk(log_dir):
        found += [f for f in files if f.endswith((".trace.json.gz", ".pb",
                                                  ".xplane.pb"))]
    assert found, f"no trace artifacts under {log_dir}"


def test_bench_py_probe_timeout_emits_error_json():
    """The driver contract under a dead backend: ``bench.py`` must print
    ONE parseable JSON line carrying the standard keys plus ``error`` and
    exit non-zero — never hang (the axon tunnel has been observed to block
    ``jax.devices()`` indefinitely; the probe thread bounds that). A
    near-zero probe timeout forces that path without needing a dead
    tunnel."""
    import json
    import subprocess
    import sys

    from conftest import REPO_ROOT, cli_env

    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py")],
        capture_output=True, text=True, timeout=120, cwd=REPO_ROOT,
        env=cli_env(extra={"ABLC_BENCH_PROBE_TIMEOUT": "0.0001"}))
    assert r.returncode == 1, (r.returncode, r.stdout, r.stderr)
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "cutoffvgg16_clip_inference"
    assert payload["value"] == 0 and payload["vs_baseline"] == 0.0
    assert payload["unit"] == "frames/sec"
    assert "unresponsive" in payload["error"]
