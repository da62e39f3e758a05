"""Fold-parallel (vmapped + mesh-sharded) cross-validation tests."""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.data.splits import (fold_train_val_test,
                                                k_fold_splits)
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.parallel import mesh as mesh_lib
from ab_line_classifier_tpu.parallel.trial_parallel import (
    ParallelFoldTrainer, pad_index_table)

HP = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 8,
      "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
      "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}


def test_pad_index_table():
    table, mask = pad_index_table([np.array([1, 2, 3]), np.array([4])])
    assert table.shape == (2, 3)
    np.testing.assert_array_equal(mask, [[1, 1, 1], [1, 0, 0]])
    np.testing.assert_array_equal(table[1], [4, 0, 0])


@pytest.fixture(scope="module")
def fold_setup(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("folds_ws"))
    fcsv, _, fdir = generate_dataset(ws, n_patients=15, clips_per_patient=2,
                                     frames_per_clip=3, hw=(32, 32), seed=5)
    df = pd.read_csv(fcsv)
    ds = FrameDataset(df, fdir, img_dim=(32, 32))
    frames, labels = ds.load_all()
    folds = k_fold_splits(df, 2, random_seed=42)
    train_idx, val_idx, cls_w = [], [], []
    for f in range(2):
        tr, va, _ = fold_train_val_test(folds, f, 0.15, random_seed=42)
        train_idx.append(tr.index.to_numpy())
        val_idx.append(va.index.to_numpy())
        hist = np.bincount(tr["Class"], minlength=2)
        cls_w.append(0.5 * hist.sum() / np.maximum(hist, 1))
    return frames, labels, train_idx, val_idx, np.stack(cls_w)


def test_parallel_folds_train(fold_setup):
    frames, labels, train_idx, val_idx, cls_w = fold_setup
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    pt = ParallelFoldTrainer(spec, 2, class_weights=cls_w, seed=0)
    best, hist = pt.fit(frames, labels, train_idx, val_idx, batch_size=16,
                        epochs=2, patience=4, verbose=False)
    assert len(hist) == 2
    # stacked per-fold state
    leaf = jax.tree.leaves(best["params"])[0]
    assert leaf.shape[0] == 2
    # per-fold metrics arrays
    assert hist[-1]["val_loss"].shape == (2,)
    # folds have different inits and see different data -> different learned
    # weights (compare a *trainable* layer; BN layers are frozen identically)
    kernel = np.asarray(best["params"]["conv2d_block0_0"]["kernel"])
    assert not np.allclose(kernel[0], kernel[1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parallel_folds_on_mesh(fold_setup):
    frames, labels, train_idx, val_idx, cls_w = fold_setup
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    mesh = mesh_lib.make_mesh(n_data=4, n_trial=2)
    pt = ParallelFoldTrainer(spec, 2, class_weights=cls_w, seed=0, mesh=mesh)
    best, hist = pt.fit(frames, labels, train_idx, val_idx, batch_size=16,
                        epochs=1, patience=4, verbose=False)
    leaf = jax.tree.leaves(best["params"])[0]
    assert leaf.shape[0] == 2
    assert np.isfinite(hist[-1]["val_loss"]).all()
