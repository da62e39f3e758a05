"""Crash-resume: a REAL training process SIGKILLed mid-run resumes to the
same final model as an uninterrupted run.

The in-process tests (tests/test_resume.py) prove Trainer-level resume
bit-exactness; what only a hard-killed subprocess can prove is the claim
the checkpoint design actually makes (``utils/resume.py``: fsync +
``os.replace`` single-blob atomicity): a SIGKILL at an arbitrary moment —
mid-epoch, even mid-checkpoint-write — never corrupts state, and after
``--resume`` the run completes with the same final weights as if it had
never been interrupted. This is the recovery story the reference lacks
entirely (its only failure mitigation is per-epoch gc/clear_session,
reference ``src/train.py:161-164``; a crash loses the run).
"""

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml

import jax

from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.utils.checkpoint import load_model
from tests.conftest import (REPO_ROOT, cli_env,
                            derive_workspace_config)

pytestmark = pytest.mark.slow


def _make_workspace(root, name):
    """Workspaces built with the same seed hold identical datasets, so the
    uninterrupted and killed runs see the same pixels and labels."""
    ws = os.path.join(str(root), name)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=10,
                                        clips_per_patient=2,
                                        frames_per_clip=3, hw=(32, 32),
                                        seed=23)
    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EXPERIMENT_TYPE": "single_train",
                       "EPOCHS": 12, "BATCH_SIZE": 16, "PATIENCE": 50,
                       "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    cfg_path = os.path.join(ws, "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
    return ws, cfg_path


def _env(cfg_path):
    return cli_env(cfg_path)


def _train(cfg_path, *args):
    proc = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.train", *args],
        env=_env(cfg_path), cwd=REPO_ROOT, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, f"train failed:\n{proc.stderr[-4000:]}"


def _final_params(ws):
    variables, _ = load_model(os.path.join(ws, "results", "models", "latest"))
    return variables["params"]


def test_sigkill_mid_sweep_resumes_at_trial_granularity(tmp_path):
    """SIGKILL a serial hparam_search after its first trial lands, then
    ``--resume --sweep-id``: completed trials are never retrained (their
    persisted records stay byte-identical) and the sweep finishes with the
    full trial budget."""
    ws, cfg_path = _make_workspace(tmp_path, "sweep")
    with open(cfg_path) as f:
        d = yaml.safe_load(f)
    d["TRAIN"].update({"EXPERIMENT_TYPE": "hparam_search", "EPOCHS": 2})
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 3, "METHOD": "bayes"})
    d["HPARAM_SEARCH"]["CNN0"] = {
        "LR": {"TYPE": "float_log", "RANGE": [1e-4, 1e-2]},
        "DROPOUT": {"TYPE": "float_uniform", "RANGE": [0.0, 0.5]}}
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
    trials_path = os.path.join(ws, "results", "experiments",
                               "crash-sweep.jsonl")

    victim = subprocess.Popen(
        [sys.executable, "-m", "ab_line_classifier_tpu.train",
         "--sweep-id", "crash-sweep"],
        env=_env(cfg_path), cwd=REPO_ROOT,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.exists(trials_path) and os.path.getsize(trials_path):
                break
            if victim.poll() is not None:
                pytest.fail("sweep finished before its first trial landed")
            time.sleep(0.02)
        else:
            pytest.fail("no trial record appeared within 600s")
        victim.send_signal(signal.SIGKILL)
        victim.wait(timeout=60)
    finally:
        if victim.poll() is None:
            victim.kill()
            victim.wait(timeout=60)

    with open(trials_path, "rb") as f:
        first_record = f.readline()
    n_before = sum(1 for _ in open(trials_path))
    assert 1 <= n_before < 3

    _train(cfg_path, "--resume", "--sweep-id", "crash-sweep")

    with open(trials_path, "rb") as f:
        lines = f.readlines()
    assert len(lines) == 3
    assert lines[0] == first_record, "completed trial was retrained"
    assert glob.glob(os.path.join(ws, "results", "experiments",
                                  "hparam_search_*.csv"))


def test_sigkill_mid_training_resumes_to_identical_model(tmp_path):
    ws_a, cfg_a = _make_workspace(tmp_path, "uninterrupted")
    ws_b, cfg_b = _make_workspace(tmp_path, "killed")

    # Reference run: trains 12 epochs start-to-finish.
    _train(cfg_a, "--checkpoint-dir", os.path.join(ws_a, "ck"))
    params_a = _final_params(ws_a)

    # Victim run: SIGKILL the moment the first per-epoch checkpoint lands
    # (mid-trajectory — 11 epochs of budget remain, and the kill races
    # freely against the next epoch's compute and checkpoint write).
    ck_b = os.path.join(ws_b, "ck")
    victim = subprocess.Popen(
        [sys.executable, "-m", "ab_line_classifier_tpu.train",
         "--checkpoint-dir", ck_b],
        env=_env(cfg_b), cwd=REPO_ROOT,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if glob.glob(os.path.join(ck_b, "*")):
                break
            if victim.poll() is not None:
                pytest.fail("training finished before a checkpoint appeared")
            time.sleep(0.02)
        else:
            pytest.fail("no checkpoint appeared within 600s")
        victim.send_signal(signal.SIGKILL)
        rc = victim.wait(timeout=60)
    finally:
        if victim.poll() is None:
            victim.kill()
            victim.wait(timeout=60)

    assert rc == -signal.SIGKILL
    # The killed run must not have completed: no final model was saved.
    assert not glob.glob(os.path.join(ws_b, "results", "models", "model*"))

    # Resume from the (possibly torn-write-raced) checkpoint and finish.
    _train(cfg_b, "--checkpoint-dir", ck_b, "--resume")
    params_b = _final_params(ws_b)

    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(params_b)}
    assert len(flat_a) == len(flat_b) and len(flat_a) > 0
    for key, leaf_a in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf_a), np.asarray(flat_b[jax.tree_util.keystr(key)]),
            atol=1e-6, err_msg=f"leaf {jax.tree_util.keystr(key)} diverged "
                               f"after crash-resume")


def test_sigkill_mid_trial_parallel_sweep_resumes_identically(tmp_path):
    """SIGKILL an SPMD trial-parallel LR sweep mid-run on a virtual
    8-device mesh, ``--resume``, and require the SAME per-trial objectives
    as an uninterrupted run: this exercises the whole stacked-state
    checkpoint machinery (atomic msgpack blob, sharding re-establishment,
    per-epoch history restore) across a real process boundary."""
    def sweep_ws(name):
        ws, cfg_path = _make_workspace(tmp_path, name)
        with open(cfg_path) as f:
            d = yaml.safe_load(f)
        d["TRAIN"].update({"EXPERIMENT_TYPE": "hparam_search", "EPOCHS": 8})
        d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 2})
        d["HPARAM_SEARCH"]["CNN0"] = {
            "LR": {"TYPE": "float_log", "RANGE": [1e-4, 1e-2]}}
        d["PARALLEL"]["MESH"] = {"DATA": 4, "TRIAL": 2}
        with open(cfg_path, "w") as f:
            yaml.safe_dump(d, f, sort_keys=False)
        return ws, cfg_path

    def env8(cfg_path):
        env = _env(cfg_path)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        return env

    def objectives(ws):
        import pandas as pd

        csvs = glob.glob(os.path.join(ws, "results", "experiments",
                                      "lr_sweep_parallel_*.csv"))
        assert csvs, "sweep wrote no results CSV"
        df = pd.read_csv(max(csvs, key=os.path.getmtime))
        return df.sort_values("trial")[["LR", "objective"]].to_numpy()

    # Reference run: uninterrupted.
    ws_a, cfg_a = sweep_ws("tp_uninterrupted")
    proc = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.train",
         "--trial-parallel", "--checkpoint-dir", os.path.join(ws_a, "ck")],
        env=env8(cfg_a), cwd=REPO_ROOT, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # Victim: kill the moment the first stacked checkpoint lands.
    ws_b, cfg_b = sweep_ws("tp_killed")
    ck_b = os.path.join(ws_b, "ck")
    victim = subprocess.Popen(
        [sys.executable, "-m", "ab_line_classifier_tpu.train",
         "--trial-parallel", "--checkpoint-dir", ck_b],
        env=env8(cfg_b), cwd=REPO_ROOT,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if glob.glob(os.path.join(ck_b, "*")):
                break
            if victim.poll() is not None:
                pytest.fail("sweep finished before a checkpoint appeared")
            time.sleep(0.02)
        else:
            pytest.fail("no checkpoint appeared within 600s")
        victim.send_signal(signal.SIGKILL)
        victim.wait(timeout=60)
    finally:
        if victim.poll() is None:
            victim.kill()
            victim.wait(timeout=60)

    proc = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.train",
         "--trial-parallel", "--checkpoint-dir", ck_b, "--resume"],
        env=env8(cfg_b), cwd=REPO_ROOT, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]

    a, b = objectives(ws_a), objectives(ws_b)
    np.testing.assert_allclose(b, a, atol=1e-4,
                               err_msg="resumed sweep diverged from the "
                                       "uninterrupted run")
