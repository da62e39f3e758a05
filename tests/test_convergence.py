"""End-to-end convergence: the framework LEARNS, not just matches Keras steps.

The reference's only QA is empirical held-out evaluation
(``/root/reference/src/train_utils.py:92-122``); these tests are its
automated analogue — train to completion on a synthetic linearly-separable
frame dataset and assert held-out frame AUC and clip accuracy >= 0.9. A
loss-scale bug shared with the Keras parity fixtures, or a data-pipeline
label misalignment Keras never sees, fails here and nowhere else.

Covers the serial path (``perform_single_run``: cnn0 from scratch AND the
flagship cutoffvgg16 two-phase plan) and the trial-parallel SPMD path
(``ParallelFoldTrainer``), each to >= 0.9 held-out frame AUC, >= 0.9
accuracy, and (serial cnn0 / parallel folds) >= 0.9 clip accuracy.

Epoch budgets note BN semantics: cnn0's BatchNorm uses Keras momentum 0.99,
so running statistics need O(hundred) steps to converge — rankings (AUC) are
right within a few epochs, but threshold-0.5 accuracy needs the stats, hence
30 short epochs rather than 10.
"""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.config import Config
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from conftest import derive_workspace_config

pytestmark = pytest.mark.slow

NO_AUG = {"ZOOM_RANGE": 0.0, "WIDTH_SHIFT_RANGE": 0.0,
          "HEIGHT_SHIFT_RANGE": 0.0, "ROTATION_RANGE": 0.0,
          "BRIGHTNESS_RANGE": 0.0, "HORIZONTAL_FLIP": False}


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("convergence_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=16,
                                        clips_per_patient=2,
                                        frames_per_clip=6, hw=(32, 32),
                                        seed=11)
    base = derive_workspace_config(ws, fcsv, ccsv, fdir)
    base["TRAIN"]["DATA_AUG"] = dict(NO_AUG)
    return ws, fcsv, ccsv, fdir, base


def _clip_accuracy(cfg, fcsv, ccsv) -> float:
    """Clip accuracy over the full clips table via the production
    clip-prediction path (average algorithm, threshold 0.5)."""
    from ab_line_classifier_tpu.predict.predict import compute_clip_predictions

    compute_clip_predictions(cfg, fcsv, ccsv, class_thresh=0.5,
                             clip_algorithm="average")
    ws_metrics = cfg["PATHS"]["METRICS"]
    latest = max(glob.glob(os.path.join(ws_metrics, "clips_*.json")),
                 key=os.path.getmtime)
    return json.load(open(latest))["accuracy"]


def test_cnn0_serial_convergence(dataset):
    """Scratch model, serial trainer: held-out frame AUC/accuracy and clip
    accuracy all >= 0.9."""
    ws, fcsv, ccsv, fdir, base = dataset
    d = json.loads(json.dumps(base))
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 30, "BATCH_SIZE": 16,
                       "PATIENCE": 30, "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 2, "INIT_FILTERS": 8,
                                 "NODES_DENSE0": 16, "LR": 1e-3})
    d["PATHS"]["MODEL_WEIGHTS"] = ws + "/results/models_cnn0/"
    d["PATHS"]["MODEL_TO_LOAD"] = ws + "/results/models_cnn0/latest"
    cfg = Config(d)
    from ab_line_classifier_tpu.train.experiment import perform_single_run

    result = perform_single_run(cfg, save_weights=True, verbose=False)
    assert result.test_metrics["macro_mean_auc"] >= 0.9, result.test_metrics
    assert result.test_metrics["accuracy"] >= 0.9, result.test_metrics
    assert _clip_accuracy(cfg, fcsv, ccsv) >= 0.9


def test_cutoffvgg16_serial_convergence(dataset):
    """The flagship two-phase plan (extract head-only, then finetune) from
    random init: held-out frame AUC/accuracy >= 0.9."""
    ws, fcsv, ccsv, fdir, base = dataset
    d = json.loads(json.dumps(base))
    d["TRAIN"].update({"MODEL_DEF": "cutoffvgg16", "EPOCHS": 12,
                       "BATCH_SIZE": 16, "PATIENCE": 12,
                       "MIXED_PRECISION": False})
    d["HPARAMS"]["CUTOFFVGG16"].update({"LR_EXTRACT": 1e-3,
                                        "LR_FINETUNE": 1e-4,
                                        "EXTRACT_EPOCHS": 8,
                                        "DROPOUT": 0.3})
    d["PATHS"]["MODEL_WEIGHTS"] = ws + "/results/models_cvgg/"
    d["PATHS"]["MODEL_TO_LOAD"] = ws + "/results/models_cvgg/latest"
    cfg = Config(d)
    from ab_line_classifier_tpu.train.experiment import perform_single_run

    result = perform_single_run(cfg, save_weights=True, verbose=False)
    assert result.test_metrics["macro_mean_auc"] >= 0.9, result.test_metrics
    assert result.test_metrics["accuracy"] >= 0.9, result.test_metrics


def test_cnn0_trial_parallel_convergence(dataset):
    """The SPMD fold-parallel trainer converges too: every fold's held-out
    frame AUC, frame accuracy, and clip accuracy >= 0.9."""
    import jax
    from sklearn.metrics import roc_auc_score

    from ab_line_classifier_tpu.data.pipeline import FrameDataset
    from ab_line_classifier_tpu.data.splits import (fold_train_val_test,
                                                    k_fold_splits)
    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.models.preprocess import get_preprocess_fn
    from ab_line_classifier_tpu.parallel.trial_parallel import (
        ParallelFoldTrainer)

    ws, fcsv, ccsv, fdir, base = dataset
    df = pd.read_csv(fcsv)
    ds = FrameDataset(df, fdir, img_dim=(32, 32))
    frames, labels = ds.load_all()

    n_folds = 2
    folds = k_fold_splits(df, n_folds, random_seed=42)
    train_idx, val_idx, cls_w = [], [], []
    for f in range(n_folds):
        tr, va, _ = fold_train_val_test(folds, f, 0.15, random_seed=42)
        train_idx.append(tr.index.to_numpy())
        val_idx.append(va.index.to_numpy())
        hist = np.bincount(tr["Class"], minlength=2)
        cls_w.append(0.5 * hist.sum() / np.maximum(hist, 1))

    hp = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 16,
          "KERNEL_SIZE": 3, "STRIDES": 1, "MAXPOOL_SIZE": 2, "BLOCKS": 2,
          "INIT_FILTERS": 8, "FILTER_EXP_BASE": 2}
    spec = build_model("cnn0", hp, (32, 32, 3), 2)
    # Batch 8 / 60 epochs: ~360 BN running-stat updates per fold, enough
    # for Keras-momentum-0.99 statistics to converge (see module docstring).
    pt = ParallelFoldTrainer(spec, n_folds, class_weights=np.stack(cls_w),
                             seed=0)
    best, _ = pt.fit(frames, labels, train_idx, val_idx, batch_size=8,
                     epochs=60, patience=60, verbose=False)

    module = spec.module()
    prep = get_preprocess_fn(spec.preprocess_mode)
    fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))
    for f in range(n_folds):
        vars_f = jax.tree.map(lambda a: np.asarray(a)[f], best)
        idx = val_idx[f]
        probs = np.asarray(fwd(vars_f, prep(frames[idx].astype(np.float32))))
        y = labels[idx]
        auc = roc_auc_score(y, probs[:, 1])
        acc = float(((probs[:, 1] >= 0.5).astype(int) == y).mean())
        assert auc >= 0.9, (f, auc)
        assert acc >= 0.9, (f, acc)
        # Clip-level: mean frame prob per clip, threshold 0.5 (the
        # 'average' algorithm, reference predict.py:163-164).
        clip_ids = df["id"].to_numpy()[idx]
        correct, total = 0, 0
        for cid in np.unique(clip_ids):
            sel = clip_ids == cid
            pred = int(probs[sel, 1].mean() >= 0.5)
            correct += int(pred == int(y[sel][0]))
            total += 1
        assert correct / total >= 0.9, (f, correct / total)
