"""EarlyStopping restore-best-weights semantics (reference train.py:155-156).

tf.keras EarlyStopping(restore_best_weights=True) restores the best-val
weights ONLY when early stopping actually triggers (the restore sits inside
the wait>=patience branch of on_epoch_end); a fit() that runs its full
epoch budget ends with the FINAL epoch's weights. cutoffvgg16's extract
phase depends on this: it hands its last epoch — not its best epoch — to
the finetune phase.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.data.splits import train_val_test_split
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.parallel.trial_parallel import ParallelFoldTrainer
from ab_line_classifier_tpu.train.loop import Trainer

# LR 0.5: on this fixture val_loss worsens monotonically after epoch 0,
# so the best epoch is never the last one.
HP = {"LR": 0.5, "DROPOUT": 0.0, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
      "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
      "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}
KERNEL = "conv2d_block0_0"


class _Recorder:
    def __init__(self):
        self.snapshots = []

    def on_epoch_end(self, epoch, variables):
        self.snapshots.append(
            np.asarray(variables["params"][KERNEL]["kernel"]).copy())


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("restore_ws"))
    fcsv, _, fdir = generate_dataset(ws, n_patients=10, clips_per_patient=2,
                                     frames_per_clip=3, hw=(32, 32), seed=7)
    df = pd.read_csv(fcsv)
    tr, va, _ = train_val_test_split(df, 0.15, 0.15, random_seed=42)
    return (FrameDataset(tr, fdir, img_dim=(32, 32)),
            FrameDataset(va, fdir, img_dim=(32, 32)))


def test_full_budget_keeps_final_weights(data):
    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    rec = _Recorder()
    out, hist = Trainer(spec, seed=0).fit(
        tds, vds, batch_size=16, epochs=4, patience=10, verbose=False,
        callbacks=[rec])
    assert len(hist) == 4  # no early stop (patience 10 > 4 epochs)
    val_losses = [h.val["loss"] for h in hist]
    assert int(np.argmin(val_losses)) != len(hist) - 1, \
        "precondition: best epoch must differ from the last (LR too small?)"
    got = np.asarray(out["params"][KERNEL]["kernel"])
    np.testing.assert_array_equal(got, rec.snapshots[-1])
    assert not np.array_equal(got,
                              rec.snapshots[int(np.argmin(val_losses))])


def test_early_stop_restores_best_weights(data):
    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    rec = _Recorder()
    out, hist = Trainer(spec, seed=0).fit(
        tds, vds, batch_size=16, epochs=20, patience=2, verbose=False,
        callbacks=[rec])
    assert len(hist) < 20  # diverging loss must trip patience 2
    val_losses = [h.val["loss"] for h in hist]
    best_epoch = int(np.argmin(val_losses))
    np.testing.assert_array_equal(
        np.asarray(out["params"][KERNEL]["kernel"]),
        rec.snapshots[best_epoch])


def test_parallel_end_vars_per_fold_selection():
    """_end_vars mixes per fold: early-stopped folds get best weights,
    budget-exhausted folds keep final weights."""
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    pt = ParallelFoldTrainer(spec, 2,
                             class_weights=np.ones((2, 2), np.float32),
                             seed=0)
    params = {"layer": {"kernel": jax.numpy.ones((2, 3))}}
    best = {"layer": {"kernel": jax.numpy.zeros((2, 3))}}
    wait = np.array([5, 0])  # fold 0 early-stopped (patience 3), fold 1 not
    carry, carry_bs = pt._end_vars(params, {}, best, None, wait, patience=3)
    got = np.asarray(carry["layer"]["kernel"])
    np.testing.assert_array_equal(got[0], np.zeros(3))  # best restored
    np.testing.assert_array_equal(got[1], np.ones(3))   # final kept
    assert carry_bs is None
