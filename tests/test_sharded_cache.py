"""Mesh-sharded device dataset cache: N devices hold N× the dataset in HBM
with batch gathers reconstructed by one all-reduce — and training is
bit-identical to the replicated cache (VERDICT r2 item #3).

The reference's pipeline is host-side tf.data with no device placement at
all (reference ``src/data/preprocessor.py:36-66``); the memory model here is
documented in docs/SCALING.md.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data.pipeline import (DeviceCachedDataset,
                                                  FrameDataset,
                                                  ShardedDeviceCachedDataset,
                                                  maybe_device_cache)
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.parallel import mesh as mesh_lib

HP = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 8,
      "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
      "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}


@pytest.fixture(scope="module")
def small_ds(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("sharded_cache_ws"))
    fcsv, _, fdir = generate_dataset(ws, n_patients=10, clips_per_patient=2,
                                     frames_per_clip=3, hw=(32, 32), seed=9)
    return FrameDataset(pd.read_csv(fcsv), fdir, img_dim=(32, 32))


@pytest.fixture(scope="module")
def mesh():
    return mesh_lib.make_mesh(n_data=8, n_trial=1)


def test_frames_actually_shard(small_ds, mesh):
    sc = ShardedDeviceCachedDataset(small_ds, mesh)
    d = mesh.shape[mesh_lib.DATA_AXIS]
    n = len(small_ds)
    s = -(-n // d)
    assert sc.frames.shape[:2] == (d, s)
    # Every device holds exactly one 1/D slice of the padded frame axis —
    # the aggregate-HBM claim, checked at the shard level.
    for shard in sc.frames.addressable_shards:
        assert shard.data.shape[0] == 1
    assert len({sh.device for sh in sc.frames.addressable_shards}) == d


def test_batches_match_replicated(small_ds, mesh):
    rc = DeviceCachedDataset(small_ds, mesh=mesh)
    sc = ShardedDeviceCachedDataset(small_ds, mesh)
    for shuffle in (False, True):
        for br, bs in zip(rc.batches(8, shuffle=shuffle, seed=3),
                          sc.batches(8, shuffle=shuffle, seed=3)):
            # dtype too: the all-reduce must accumulate in uint8, not
            # promote (4x the ICI bytes otherwise).
            assert np.asarray(bs.images).dtype == np.uint8
            np.testing.assert_array_equal(np.asarray(br.images),
                                          np.asarray(bs.images))
            np.testing.assert_array_equal(np.asarray(br.labels),
                                          np.asarray(bs.labels))
            np.testing.assert_array_equal(br.mask, bs.mask)


def test_training_bit_identical_to_replicated(small_ds, mesh):
    """Two full fits (scan-epoch path) from the same seed: per-epoch losses
    and final parameters must be BIT-identical between the replicated and
    sharded caches — the gather's all-reduce reconstructs every batch
    exactly."""
    from ab_line_classifier_tpu.train.loop import Trainer

    spec = build_model("cnn0", HP, (32, 32, 3), 2)

    def run(cached):
        trainer = Trainer(spec, seed=0, mesh=mesh)
        variables, history = trainer.fit(cached, cached, batch_size=16,
                                         epochs=2, patience=5, verbose=False)
        return variables, history

    v_rep, h_rep = run(DeviceCachedDataset(small_ds, mesh=mesh))
    v_sh, h_sh = run(ShardedDeviceCachedDataset(small_ds, mesh))

    for hr, hs in zip(h_rep, h_sh):
        assert hr.train["loss"] == hs.train["loss"], (hr, hs)
        assert hr.val["loss"] == hs.val["loss"], (hr, hs)
    for a, b in zip(jax.tree.leaves(v_rep), jax.tree.leaves(v_sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trial_parallel_sharded_frames_bit_identical(small_ds, mesh):
    """The fold-parallel trainer accepts a data-axis-sharded frame store
    too (folds shard over 'trial', pixels over 'data'): histories and best
    weights bit-match the replicated run."""
    from ab_line_classifier_tpu.data.splits import (fold_train_val_test,
                                                    k_fold_splits)
    from ab_line_classifier_tpu.parallel.trial_parallel import (
        ParallelFoldTrainer)

    df = small_ds.df
    frames, labels = small_ds.load_all()
    folds = k_fold_splits(df, 2, random_seed=42)
    train_idx, val_idx, cls_w = [], [], []
    for f in range(2):
        tr, va, _ = fold_train_val_test(folds, f, 0.2, random_seed=42)
        train_idx.append(tr.index.to_numpy())
        val_idx.append(va.index.to_numpy())
        hist = np.bincount(tr["Class"], minlength=2)
        cls_w.append(0.5 * hist.sum() / np.maximum(hist, 1))

    spec = build_model("cnn0", HP, (32, 32, 3), 2)

    def run(shard):
        pt = ParallelFoldTrainer(spec, 2, class_weights=np.stack(cls_w),
                                 seed=0, mesh=mesh)
        best, hist = pt.fit(frames, labels, train_idx, val_idx,
                            batch_size=16, epochs=2, patience=4,
                            verbose=False, shard_dataset=shard)
        assert pt._frames_sharded is shard
        return best, hist

    best_rep, hist_rep = run(False)
    best_sh, hist_sh = run(True)
    for hr, hs in zip(hist_rep, hist_sh):
        np.testing.assert_array_equal(hr["train_loss"], hs["train_loss"])
        np.testing.assert_array_equal(hr["val_loss"], hs["val_loss"])
    for a, b in zip(jax.tree.leaves(best_rep), jax.tree.leaves(best_sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_cache_tiers(small_ds, mesh):
    """'auto' picks: replicated when one device's budget fits, sharded when
    only the aggregate mesh budget fits, host streaming otherwise."""
    nbytes = len(small_ds) * 32 * 32 * 3
    fits = maybe_device_cache(small_ds, "auto", mesh=mesh, budget=2 * nbytes)
    assert type(fits) is DeviceCachedDataset
    agg = maybe_device_cache(small_ds, "auto", mesh=mesh,
                             budget=nbytes // 4)
    assert type(agg) is ShardedDeviceCachedDataset
    none = maybe_device_cache(small_ds, "auto", mesh=mesh,
                              budget=nbytes // 100)
    assert none is small_ds
    # Forced caching picks the sharded tier too when one device's budget
    # can't hold the frames (never OOM-attempt the replicated cache).
    forced = maybe_device_cache(small_ds, True, mesh=mesh,
                                budget=nbytes // 4)
    assert type(forced) is ShardedDeviceCachedDataset
    # No mesh -> no sharded tier to fall back to.
    host = maybe_device_cache(small_ds, "auto", mesh=None,
                              budget=nbytes // 4)
    assert host is small_ds
