"""Figure rasterization (plot_to_tensor parity) and tracker image logging
(reference visualization.py:17-30, train_legacy.py:258-278)."""

import glob
import json
import os

import numpy as np

from ab_line_classifier_tpu.train.tracker import LocalTracker
from ab_line_classifier_tpu.viz.visualization import (
    fig_to_array, plot_bayesian_hparam_opt, plot_confusion_matrix)


def test_fig_to_array():
    fig = plot_confusion_matrix([0, 1, 1], [0, 1, 0], ["a_lines", "b_lines"])
    arr = fig_to_array(fig)
    assert arr.ndim == 3 and arr.shape[-1] == 3
    assert arr.dtype == np.uint8
    assert arr.std() > 0  # not a blank canvas


def test_local_tracker_log_image(tmp_path):
    t = LocalTracker(str(tmp_path), run_name="imgrun")
    img = np.random.RandomState(0).randint(0, 256, (32, 48, 3), np.uint8)
    t.log_image("roc", img)
    fig = plot_confusion_matrix([0, 1], [0, 1], ["a_lines", "b_lines"])
    t.log_image("cm", fig, step=3)
    t.finish()
    files = sorted(os.path.basename(p) for p in
                   glob.glob(str(tmp_path / "imgrun" / "images" / "*.png")))
    assert files == ["cm_3.png", "roc.png"]
    events = [json.loads(l) for l in
              open(tmp_path / "imgrun" / "events.jsonl")]
    img_events = [e for e in events if e["event"] == "image"]
    assert {e["name"] for e in img_events} == {"roc", "cm"}
    # round-trip: the saved png decodes back to the logged array
    from PIL import Image
    back = np.asarray(Image.open(tmp_path / "imgrun" / "images" / "roc.png"))
    np.testing.assert_array_equal(back, img)


def test_tensorboard_tracker_writes_event_files(tmp_path):
    """TensorBoard backend (reference train_legacy.py:239-279 logs under
    results/logs/{timestamp}): the full tracker surface — config, epochs,
    metrics, an image, finish — lands in a tfevents file under the run dir,
    and make_tracker selects it from TRACKER.BACKEND."""
    from ab_line_classifier_tpu.train.loop import EpochLog
    from ab_line_classifier_tpu.train.tracker import (TensorBoardTracker,
                                                      make_tracker)

    t = TensorBoardTracker(str(tmp_path), run_name="tbrun")
    t.log_config({"LR": 1e-3, "MODEL_DEF": "cnn0"})
    t.log_epoch(EpochLog(epoch=0, phase="extract",
                         train={"loss": 0.9, "accuracy": 0.5},
                         val={"loss": 1.0, "auc": 0.6}, lr=1e-3,
                         seconds=0.1))
    t.log_metrics("test", {"accuracy": 0.75, "note": "non-scalar skipped"})
    t.log_image("cm", np.zeros((8, 8, 3), np.uint8), step=1)
    t.finish({"status": "ok", "best_val_loss": 1.0})
    assert t.run_dir == str(tmp_path / "tbrun")
    events = glob.glob(os.path.join(t.run_dir, "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 0

    # make_tracker dispatch: TRACKER.BACKEND tensorboard -> this backend,
    # rooted at PATHS.LOGS (the reference's results/logs contract).
    cfg = {"TRACKER": {"BACKEND": "tensorboard"},
           "PATHS": {"LOGS": str(tmp_path / "logs")}}
    t2 = make_tracker(cfg, run_name="dispatched")
    assert isinstance(t2, TensorBoardTracker)
    t2.finish()
    assert glob.glob(str(tmp_path / "logs" / "dispatched" /
                         "events.out.tfevents.*"))


def test_plot_bayesian_hparam_opt(tmp_path):
    from ab_line_classifier_tpu.train.sweep import BayesController, SweepVar

    space = [SweepVar("LR", "float_log", (1e-4, 1e-2)),
             SweepVar("DROPOUT", "float_uniform", (0.0, 0.5))]
    c = BayesController(space, seed=0)
    rng = np.random.RandomState(1)
    for _ in range(8):
        p = {"LR": float(np.exp(rng.uniform(np.log(1e-4), np.log(1e-2)))),
             "DROPOUT": float(rng.uniform(0, 0.5))}
        c.observe(p, -abs(p["DROPOUT"] - 0.2))
    plot_bayesian_hparam_opt(c, dir_path=str(tmp_path))
    assert glob.glob(str(tmp_path / "bayes_opt_*.png"))
