"""resolve_datasets resolution chain: the artifact lineage feeds TRAINING.

The reference's training always pulls its splits from the artifact store at
the configured version (reference ``train.py:217-225`` →
``train_utils.py:18-46,192-235``); these tests pin the local equivalent:
a pinned ``WANDB.*_ARTIFACT_VERSION`` fetches and wins, the local
``ArtifactStore``'s TrainValTest/KFold artifact feeds training when
present, and a version pin without wandb raises instead of silently
training on a different split.
"""

import os

import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.config import Config
from ab_line_classifier_tpu.data.artifacts import store_from_config
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.train.experiment import resolve_datasets
from conftest import derive_workspace_config
from test_wandb_artifacts import wandb_world  # noqa: F401  (fixture)


@pytest.fixture()
def workspace(tmp_path):
    ws = str(tmp_path / "ws")
    # 16 patients: the store's ModelDev/Holdout split leaves ~14 patient
    # groups and the TVT splitter needs >= 1/TEST_SPLIT = 10 of them.
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=16,
                                        clips_per_patient=2,
                                        frames_per_clip=2, hw=(16, 16),
                                        seed=5)
    return ws, Config(derive_workspace_config(ws, fcsv, ccsv, fdir))


def test_local_store_artifact_feeds_training(workspace):
    """Step 3: a committed TrainValTest artifact in the local store is the
    training split (not an on-the-fly re-split); fold runs read the KFold
    artifact the same way."""
    ws, cfg = workspace
    baseline_train, _, _, _ = resolve_datasets(cfg)  # on-the-fly (step 4)

    store = store_from_config(cfg)
    store.log_images(cfg["PATHS"]["FRAME_TABLE"],
                     cfg["PATHS"]["CLIPS_TABLE"],
                     frames_dir=cfg["PATHS"]["FRAMES"])
    store.log_model_dev_holdout(cfg)
    store.log_train_val_test(cfg)
    store.log_k_fold_cross_val(cfg)

    want_tr, want_va, want_te, want_dir = store.get_train_val_test_artifact()
    got_tr, got_va, got_te, got_dir = resolve_datasets(cfg)
    pd.testing.assert_frame_equal(got_tr.reset_index(drop=True),
                                  want_tr.reset_index(drop=True))
    pd.testing.assert_frame_equal(got_te.reset_index(drop=True),
                                  want_te.reset_index(drop=True))
    assert got_dir == (want_dir or cfg["PATHS"]["FRAMES"])
    # ModelDev/Holdout lineage means the artifact split differs from the
    # whole-table on-the-fly split — proof the store actually won.
    assert len(got_tr) != len(baseline_train) or not got_tr[
        "Frame Path"].equals(baseline_train["Frame Path"])

    f_tr, f_va, f_te, _ = store.get_fold_artifact(0)
    g_tr, g_va, g_te, _ = resolve_datasets(cfg, fold_id=0)
    pd.testing.assert_frame_equal(g_te.reset_index(drop=True),
                                  f_te.reset_index(drop=True))


def test_pinned_wandb_version_without_wandb_raises(workspace):
    """Step 1 guard: pinning an artifact version with wandb missing must
    raise naming the key — silently training on another split would be
    data corruption."""
    ws, cfg = workspace
    d = cfg.to_dict()
    d["WANDB"]["TRAIN_VAL_TEST_ARTIFACT_VERSION"] = "v2"
    with pytest.raises(ImportError,
                       match="TRAIN_VAL_TEST_ARTIFACT_VERSION"):
        resolve_datasets(Config(d))


def test_pinned_wandb_version_fetches_and_serves(workspace, wandb_world,
                                                 monkeypatch):
    """Step 1: a pinned version fetches through the W&B adapter (FakeApi)
    into the local store and training serves the fetched split."""
    from ab_line_classifier_tpu.data import wandb_artifacts as WA

    api, df = wandb_world
    monkeypatch.setattr(WA, "_default_api", lambda: api)

    ws, cfg = workspace
    d = cfg.to_dict()
    d["WANDB"]["TRAIN_VAL_TEST_ARTIFACT_VERSION"] = "latest"
    got_tr, got_va, got_te, frames_dir = resolve_datasets(Config(d))
    assert any(r.startswith("TrainValTest:") for r in api.requested)
    n = len(df)
    pd.testing.assert_frame_equal(got_tr.reset_index(drop=True),
                                  df.iloc[: n // 2].reset_index(drop=True))
    # The artifact's frames live in the (fake) W&B download cache.
    assert os.path.isdir(frames_dir)
    first = got_tr["Frame Path"].iloc[0]
    assert os.path.isfile(os.path.join(frames_dir, first))
