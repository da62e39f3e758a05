"""The results/models checkpoint contract (successor to the reference's
``results/models/model{ts}.h5`` files, reference ``src/train.py:139-144``,
``src/predict.py:39-51``): save/restore round trip, ``latest`` resolution,
and crash-safety of the save protocol (state first, ``meta.json`` as the
commit marker written last)."""

import os
import time

import numpy as np
import pytest

from ab_line_classifier_tpu.utils.checkpoint import (
    is_model_dir, load_model, resolve_model_dir, save_model)

META = {"model_name": "cnn0", "input_shape": [32, 32, 3], "n_classes": 2,
        "hparams": {"LR": 1e-3}}


def _variables(seed):
    rng = np.random.default_rng(seed)
    return {"params": {"dense": {"kernel": rng.normal(size=(4, 2)),
                                 "bias": rng.normal(size=(2,))}}}


def test_save_load_round_trip(tmp_path):
    v = _variables(0)
    d = save_model(str(tmp_path / "model1"), v, META)
    got, meta = load_model(d)
    np.testing.assert_array_equal(np.asarray(got["params"]["dense"]["kernel"]),
                                  v["params"]["dense"]["kernel"])
    assert meta["model_name"] == "cnn0"
    assert not os.path.exists(os.path.join(d, "meta.json.tmp"))


def test_latest_resolution_skips_crashed_saves(tmp_path):
    """A save that crashed mid-write must never win ``latest`` resolution
    (it would shadow older GOOD checkpoints and fail at restore). Both
    halves of the torn protocol are simulated: state without the meta
    commit marker (the meta-last ordering's crash signature) and a bare
    meta.json (the legacy meta-first signature)."""
    root = tmp_path / "models"
    good = save_model(str(root / "model20240101-000000"), _variables(1), META)

    time.sleep(0.05)  # newest-mtime resolution needs distinct mtimes
    torn_state = root / "model20990101-000000"  # newer than the good one
    os.makedirs(torn_state / "state")
    assert not is_model_dir(str(torn_state))

    torn_meta = root / "model20990102-000000"
    os.makedirs(torn_meta)
    (torn_meta / "meta.json").write_text("{}")
    assert not is_model_dir(str(torn_meta))

    assert resolve_model_dir(str(root)) == good
    assert resolve_model_dir(str(root / "latest")) == good
    got, _ = load_model(str(root / "latest"))
    np.testing.assert_array_equal(
        np.asarray(got["params"]["dense"]["bias"]),
        _variables(1)["params"]["dense"]["bias"])


def test_resolution_errors_when_nothing_restorable(tmp_path):
    root = tmp_path / "models"
    torn = root / "model1"
    os.makedirs(torn)
    (torn / "meta.json").write_text("{}")
    with pytest.raises(FileNotFoundError):
        resolve_model_dir(str(root))
