"""PredictionTableLogger — the reference's WandbGradcamEvalCallback
capability (reference ``src/train_utils.py:238-293``): per-epoch validation
prediction tables plus optional Grad-CAM heatmaps. The e2e flows exercise
the table path implicitly; this module pins the table contract and the
heatmap branch directly."""

import glob
import os

import jax
import numpy as np
import pytest

from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.models.registry import build_model
from ab_line_classifier_tpu.train.callbacks import PredictionTableLogger

HP = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 8,
      "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
      "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}


class _DirTracker:
    """Duck-typed tracker: the callback only reads ``run_dir``."""

    def __init__(self, run_dir):
        self.run_dir = run_dir


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("cb_ws"))
    fcsv, _, fdir = generate_dataset(ws, n_patients=6, clips_per_patient=1,
                                     frames_per_clip=3, hw=(32, 32), seed=11)
    ds = FrameDataset.from_csv(fcsv, fdir, img_dim=(32, 32))
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    variables = spec.init_variables(jax.random.PRNGKey(0))
    return ws, ds, spec, variables


def test_table_contract(setup):
    ws, ds, spec, variables = setup
    run_dir = os.path.join(ws, "run")
    os.makedirs(run_dir, exist_ok=True)
    logger = PredictionTableLogger(spec, ds, tracker=_DirTracker(run_dir),
                                   max_rows=10)
    table = logger.on_epoch_end(3, variables)

    # W&B-table column parity (epoch/frame/label/probs/pred).
    assert list(table.columns) == ["epoch", "idx", "frame", "label",
                                   "probs", "pred"]
    assert len(table) == min(10, len(ds))
    assert (table["epoch"] == 3).all()
    # Rows map back to real dataset rows with the dataset's own labels.
    for _, row in table.iterrows():
        assert row["frame"] == str(ds.df.iloc[row["idx"]]["Frame Path"])
        assert row["label"] == int(ds.df.iloc[row["idx"]]["Class"])
        probs = np.asarray(row["probs"])
        assert probs.shape == (2,)
        assert abs(probs.sum() - 1.0) < 1e-3
        assert row["pred"] == int(np.argmax(probs))
    # CSV written under the tracker's run dir, one file per epoch.
    csv = os.path.join(run_dir, "val_predictions", "epoch_003.csv")
    assert os.path.isfile(csv)


def test_heatmap_branch_writes_pngs(setup):
    ws, ds, spec, variables = setup
    heat_dir = os.path.join(ws, "heatmaps")
    logger = PredictionTableLogger(spec, ds, max_rows=4, n_heatmaps=2,
                                   heatmap_dir=heat_dir)
    logger.on_epoch_end(0, variables)
    pngs = sorted(glob.glob(os.path.join(heat_dir, "*.png")))
    assert len(pngs) == 2
    # Names carry epoch + row tags so consecutive epochs never collide.
    assert all("epoch000_" in os.path.basename(p) for p in pngs)
    logger.on_epoch_end(1, variables)
    assert len(glob.glob(os.path.join(heat_dir, "*.png"))) == 4


def test_max_rows_zero_heatmaps_default(setup, tmp_path, monkeypatch):
    _, ds, spec, variables = setup
    monkeypatch.chdir(tmp_path)  # any stray default-path write lands here
    logger = PredictionTableLogger(spec, ds, max_rows=5)
    table = logger.on_epoch_end(0, variables)
    assert len(table) == 5
    # No tracker, no heatmap dir: nothing written anywhere, table returned.
    assert os.listdir(tmp_path) == []
