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
    # The shipped config shape (ENTITY blank, PROJECT_NAME set) must
    # qualify lookups with the project alone.
    for k in list(api._artifacts):
        api._artifacts[f"ab_line/{k}"] = api._artifacts[k]
    monkeypatch.setattr(WA, "_default_api", lambda: api)

    ws, cfg = workspace
    d = cfg.to_dict()
    d["WANDB"]["TRAIN_VAL_TEST_ARTIFACT_VERSION"] = "latest"
    got_tr, got_va, got_te, frames_dir = resolve_datasets(Config(d))
    assert any(r.startswith("ab_line/TrainValTest:") for r in api.requested)
    n = len(df)
    pd.testing.assert_frame_equal(got_tr.reset_index(drop=True),
                                  df.iloc[: n // 2].reset_index(drop=True))
    # The artifact's frames live in the (fake) W&B download cache.
    assert os.path.isdir(frames_dir)
    first = got_tr["Frame Path"].iloc[0]
    assert os.path.isfile(os.path.join(frames_dir, first))


def test_artifact_n_folds_is_the_authority(workspace):
    """A KFold artifact's own n_folds beats TRAIN.N_FOLDS: fold runs use
    the artifact count and an out-of-range fold_id raises instead of
    IndexError-ing mid-experiment (or silently skipping folds)."""
    from ab_line_classifier_tpu.train.experiment import resolve_kfold_tables

    ws, cfg = workspace
    d = cfg.to_dict()
    d["TRAIN"]["N_FOLDS"] = 3
    store = store_from_config(Config(d))
    store.log_images(cfg["PATHS"]["FRAME_TABLE"], cfg["PATHS"]["CLIPS_TABLE"],
                     frames_dir=cfg["PATHS"]["FRAMES"])
    store.log_model_dev_holdout(Config(d))
    store.log_k_fold_cross_val(Config(d))  # artifact records n_folds=3

    d["TRAIN"]["N_FOLDS"] = 10  # config lies; the artifact must win
    folds, val_split, seed, _ = resolve_kfold_tables(Config(d))
    assert len(folds) == 3
    with pytest.raises(ValueError, match="out of range"):
        resolve_datasets(Config(d), fold_id=7)


def test_pinned_version_memoized_in_store(workspace, wandb_world,
                                          monkeypatch):
    """A pinned NON-latest version already materialized in the store is
    served without re-fetching (sweeps/serial CV call resolve_datasets
    once per trial/fold; each must not re-download)."""
    from ab_line_classifier_tpu.data import wandb_artifacts as WA

    api, df = wandb_world
    for k in list(api._artifacts):
        api._artifacts[f"ab_line/{k}"] = api._artifacts[k]
    api._artifacts["ab_line/TrainValTest:v2"] = \
        api._artifacts["ab_line/TrainValTest:latest"]
    monkeypatch.setattr(WA, "_default_api", lambda: api)

    ws, cfg = workspace
    d = cfg.to_dict()
    d["WANDB"]["TRAIN_VAL_TEST_ARTIFACT_VERSION"] = "v2"
    first_tr, _, _, _ = resolve_datasets(Config(d))
    n_after_first = len(api.requested)
    second_tr, _, _, _ = resolve_datasets(Config(d))
    assert len(api.requested) == n_after_first  # no new wandb traffic
    pd.testing.assert_frame_equal(first_tr, second_tr)


def test_stale_artifact_frames_dir_falls_back(workspace):
    """An artifact whose frames_dir metadata points at a vanished dir (the
    W&B download cache can be cleared independently of the store) falls
    back to PATHS.FRAMES instead of crashing on the first frame read."""
    import json as J
    import shutil

    ws, cfg = workspace
    store = store_from_config(cfg)
    store.log_images(cfg["PATHS"]["FRAME_TABLE"], cfg["PATHS"]["CLIPS_TABLE"],
                     frames_dir=cfg["PATHS"]["FRAMES"])
    store.log_model_dev_holdout(cfg)
    tvt_path = store.log_train_val_test(cfg)

    meta_path = os.path.join(tvt_path, "metadata.json")
    meta = J.load(open(meta_path))
    dead = os.path.join(ws, "vanished_cache")
    meta["frames_dir"] = dead
    J.dump(meta, open(meta_path, "w"))

    _, _, _, frames_dir = resolve_datasets(cfg)
    assert frames_dir == cfg["PATHS"]["FRAMES"]


def test_cross_validation_parallel_uses_artifact_folds(workspace):
    """The trial-parallel k-fold path resolves folds through the same
    chain: with a 2-fold store artifact and a lying TRAIN.N_FOLDS, the
    SPMD run trains exactly the artifact's folds."""
    from ab_line_classifier_tpu.train.experiment import (
        cross_validation_parallel)

    ws, cfg = workspace
    d = cfg.to_dict()
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 1, "BATCH_SIZE": 8,
                       "PATIENCE": 5, "MIXED_PRECISION": False,
                       "N_FOLDS": 2})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    # A coarse fold-val split: ~7 patient groups remain per fold's
    # train+val, so 1/0.34 = 3 grouped splits fits.
    d["DATA"]["K_FOLD_VALIDATION_SPLIT"] = 0.34
    store = store_from_config(Config(d))
    store.log_images(cfg["PATHS"]["FRAME_TABLE"], cfg["PATHS"]["CLIPS_TABLE"],
                     frames_dir=cfg["PATHS"]["FRAMES"])
    store.log_model_dev_holdout(Config(d))
    store.log_k_fold_cross_val(Config(d))  # records n_folds=2

    d["TRAIN"]["N_FOLDS"] = 6  # must be ignored in favor of the artifact
    summary = cross_validation_parallel(Config(d), verbose=False)
    # per-fold rows + mean/std rows
    fold_rows = summary[summary["fold"].apply(
        lambda v: str(v).isdigit())]
    assert len(fold_rows) == 2
