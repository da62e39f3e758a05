"""End-to-end training + prediction + Grad-CAM on a tiny synthetic dataset
(the minimum end-to-end slice: BASELINE config #1, CPU-runnable)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from ab_line_classifier_tpu.data.synthetic import generate_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("e2e_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=12,
                                        clips_per_patient=2,
                                        frames_per_clip=4, hw=(48, 64),
                                        seed=3)
    from conftest import derive_workspace_config

    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 2, "BATCH_SIZE": 16,
                       "PATIENCE": 5, "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    from ab_line_classifier_tpu.config import Config
    return ws, Config(d)


@pytest.fixture(scope="module")
def trained(workspace):
    ws, cfg = workspace
    from ab_line_classifier_tpu.train.experiment import perform_single_run
    result = perform_single_run(cfg, save_weights=True, verbose=False)
    return ws, cfg, result


def test_single_train_produces_checkpoint(trained):
    ws, cfg, result = trained
    assert result.model_dir is not None
    assert os.path.isfile(os.path.join(result.model_dir, "meta.json"))
    assert len(result.history) == 2
    assert "accuracy" in result.test_metrics


def test_tracker_run_logged(trained):
    ws, cfg, _ = trained
    runs = glob.glob(ws + "/results/runs/*/events.jsonl")
    assert runs
    events = [json.loads(line) for line in open(runs[0])]
    kinds = {e["event"] for e in events}
    assert {"start", "epoch", "finish"} <= kinds
    summaries = glob.glob(ws + "/results/runs/*/summary.json")
    assert summaries


def test_predict_contracts(trained):
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.predict.predict import (
        compute_clip_predictions, compute_frame_predictions)
    clip_df = compute_clip_predictions(
        cfg, cfg["PATHS"]["FRAME_TABLE"], cfg["PATHS"]["CLIPS_TABLE"],
        class_thresh=0.5, clip_algorithm="average")
    assert list(clip_df.columns) == ["filename", "class", "a_lines",
                                     "b_lines"]
    frame_df = compute_frame_predictions(cfg, cfg["PATHS"]["FRAME_TABLE"],
                                         class_thresh=0.5)
    assert list(frame_df.columns) == ["Frame Path", "Class", "a_lines",
                                      "b_lines"]
    # metrics JSON contract
    clips_json = glob.glob(ws + "/results/metrics/clips_*.json")
    frames_json = glob.glob(ws + "/results/metrics/frames_*.json")
    assert clips_json and frames_json
    m = json.load(open(frames_json[0]))
    for key in ("confusion_matrix", "precision", "recall", "specificity",
                "f1", "accuracy", "macro_mean_auc", "a_lines_auc",
                "b_lines_auc"):
        assert key in m, key


def test_predict_unlabeled_tables(trained):
    """`predict --no-metrics` exists for tables WITHOUT ground truth
    (prospective data): both passes must run on Class-less frame/clip
    tables and the prediction CSVs simply omit the GT column."""
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.config import Config
    from ab_line_classifier_tpu.predict.predict import (
        compute_clip_predictions, compute_frame_predictions)

    # Own predictions dir: other tests pick the latest labeled CSV out of
    # the shared BATCH_PREDS.
    d = cfg.to_dict()
    d["PATHS"]["BATCH_PREDS"] = ws + "/results/predictions_unlabeled/"
    cfg = Config(d)

    frames = pd.read_csv(cfg["PATHS"]["FRAME_TABLE"]).drop(
        columns=["Class", "Class Name"], errors="ignore")
    clips = pd.read_csv(cfg["PATHS"]["CLIPS_TABLE"]).drop(
        columns=["class", "class_name"], errors="ignore")
    fpath = ws + "/frames_unlabeled.csv"
    cpath = ws + "/clips_unlabeled.csv"
    frames.to_csv(fpath, index=False)
    clips.to_csv(cpath, index=False)

    clip_df = compute_clip_predictions(cfg, fpath, cpath, class_thresh=0.5,
                                       clip_algorithm="average",
                                       calculate_metrics=False)
    assert list(clip_df.columns) == ["filename", "a_lines", "b_lines"]
    frame_df = compute_frame_predictions(cfg, fpath, class_thresh=0.5,
                                         calculate_metrics=False)
    assert list(frame_df.columns) == ["Frame Path", "a_lines", "b_lines"]
    assert np.allclose(frame_df[["a_lines", "b_lines"]].sum(axis=1), 1.0,
                       atol=1e-5)


def test_contiguous_algorithm_skips_auc(trained):
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.predict.predict import compute_clip_predictions
    compute_clip_predictions(
        cfg, cfg["PATHS"]["FRAME_TABLE"], cfg["PATHS"]["CLIPS_TABLE"],
        class_thresh=0.5, clip_algorithm="contiguous")
    latest = max(glob.glob(ws + "/results/metrics/clips_*.json"),
                 key=os.path.getmtime)
    m = json.load(open(latest))
    assert "macro_mean_auc" not in m  # reference predict.py:175-178


def test_gradcam_end_to_end(trained):
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.explain.gradcam import GradCAMExplainer
    df = pd.read_csv(cfg["PATHS"]["FRAME_TABLE"]).head(2)
    ex = GradCAMExplainer(cfg)
    hm = ex.apply_gradcam(df)
    assert hm.shape == tuple(cfg.img_dim)
    assert 0.0 <= float(hm.min()) and float(hm.max()) <= 1.0
    assert glob.glob(ws + "/img/heatmaps/*.png")


def test_threshold_experiment(trained):
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.predict.experiments import (
        b_line_threshold_experiment)
    from ab_line_classifier_tpu.predict.predict import (
        compute_frame_predictions)

    # Produce the frame-predictions CSV this experiment consumes (order-
    # independent: do not rely on a sibling test having written one).
    compute_frame_predictions(cfg, cfg["PATHS"]["FRAME_TABLE"],
                              class_thresh=0.5)
    preds_csv = sorted(glob.glob(ws + "/results/predictions/*_frames_predictions*.csv"))[-1]
    m = b_line_threshold_experiment(cfg, preds_csv, 0, 3, class_thresh=0.5,
                                    contiguous=True)
    assert len(m) == 4
    assert "accuracy" in m.columns


def test_sliding_window_variation_experiment(trained):
    """Reference ``sliding_window_variation_experiment`` (predict.py:379-423)
    successor: one metrics row per window length, and at window=1 the clip
    B prob must equal the clip's max frame B prob (a window of one frame
    makes the highest windowed mean the frame max)."""
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.predict.experiments import (
        sliding_window_variation_experiment)
    from ab_line_classifier_tpu.predict.predict import (
        compute_frame_predictions)

    compute_frame_predictions(cfg, cfg["PATHS"]["FRAME_TABLE"],
                              class_thresh=0.5)
    preds_csv = sorted(
        glob.glob(ws + "/results/predictions/*_frames_predictions*.csv"))[-1]
    m = sliding_window_variation_experiment(cfg, preds_csv, 1, 4,
                                            class_thresh=0.5, document=True)
    assert list(m["Sliding Window Length"]) == [1, 2, 3, 4]
    assert "accuracy" in m.columns

    # document=True writes the experiment CSV contract.
    assert glob.glob(ws + "/results/experiments/sliding_window_exp_*.csv")
    assert glob.glob(
        ws + "/results/experiments/clip_sliding_window_preds_*.csv")

    # Oracle at window=1: the clip B prob is the clip's max frame B prob.
    # Re-run for window 1 only so the written clip CSV holds window 1.
    sliding_window_variation_experiment(cfg, preds_csv, 1, 1,
                                        class_thresh=0.5, document=True)
    preds_df = pd.read_csv(preds_csv)
    clips = preds_df["Frame Path"].astype(str).str.rpartition("_")[0]
    frame_max = preds_df.groupby(clips)["b_lines"].max()
    sw1 = pd.read_csv(sorted(glob.glob(
        ws + "/results/experiments/clip_sliding_window_preds_*.csv"))[-1])
    got = sw1.set_index("Clip")["b_lines"]
    for clip_name, expect in frame_max.items():
        np.testing.assert_allclose(got[clip_name], expect, atol=1e-6)


def test_restore_and_predict_consistency(trained):
    ws, cfg, _ = trained
    from ab_line_classifier_tpu.predict.predict import Predictor
    import jax.numpy as jnp
    p = Predictor.restore(cfg["PATHS"]["MODEL_TO_LOAD"], batch_size=8,
                          compute_dtype=jnp.float32)
    frames = np.random.RandomState(0).randint(
        0, 256, (5, 32, 32, 3)).astype(np.uint8)
    probs1 = p.predict_probs(frames)
    probs2 = p.predict_probs(frames)
    np.testing.assert_array_equal(probs1, probs2)
    np.testing.assert_allclose(probs1.sum(-1), 1.0, atol=1e-5)


def test_mixed_precision_train_predict_lifecycle(tmp_path):
    """The shipped config DEFAULTS to MIXED_PRECISION: true (bf16 compute,
    MXU-native); this pins the config-driven bf16 wiring end to end on its
    own workspace: train -> checkpoint meta records mixed_precision ->
    restore serves from the meta -> finite float32 probabilities."""
    import numpy as np

    from ab_line_classifier_tpu.config import Config
    from ab_line_classifier_tpu.data.synthetic import generate_dataset
    from ab_line_classifier_tpu.predict.predict import Predictor
    from ab_line_classifier_tpu.train.experiment import perform_single_run
    from conftest import derive_workspace_config

    ws = str(tmp_path)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=12,
                                        clips_per_patient=2,
                                        frames_per_clip=4, hw=(32, 32),
                                        seed=9)
    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 2, "BATCH_SIZE": 16,
                       "PATIENCE": 5, "MIXED_PRECISION": True})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    cfg = Config(d)

    result = perform_single_run(cfg, save_weights=True, verbose=False)
    assert result.model_dir is not None
    assert np.isfinite(result.test_metrics["macro_mean_auc"])

    import json
    meta = json.load(open(os.path.join(result.model_dir, "meta.json")))
    assert meta["mixed_precision"] is True

    pred = Predictor.restore(result.model_dir)
    frames = np.random.RandomState(0).randint(
        0, 256, (4, 32, 32, 3), np.uint8)
    probs = pred.predict_probs(frames)
    assert probs.dtype == np.float32
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-2)  # bf16 fwd


def test_memory_limit_caps_device_cache(tmp_path):
    """TRAIN.USE_MEMORY_LIMIT + MEMORY_LIMIT (MB) cap the HBM frame cache
    (the TPU-native reading of the reference's GPU virtual-device cap,
    reference train.py:184-189): under a 1 MB limit an auto-cache dataset
    stays on the host streaming tier; without the flag it caches."""
    import numpy as np

    from ab_line_classifier_tpu.config import Config
    from ab_line_classifier_tpu.data.pipeline import (DeviceCachedDataset,
                                                      FrameDataset,
                                                      maybe_device_cache)
    from ab_line_classifier_tpu.data.synthetic import generate_dataset
    from ab_line_classifier_tpu.train.experiment import (
        configured_cache_budget)
    from conftest import derive_workspace_config

    ws = str(tmp_path)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=4,
                                        clips_per_patient=1,
                                        frames_per_clip=4, hw=(32, 32),
                                        seed=13)
    d = derive_workspace_config(ws, fcsv, ccsv, fdir)

    d["TRAIN"].update({"USE_MEMORY_LIMIT": True, "MEMORY_LIMIT": 1})
    capped = configured_cache_budget(Config(d))
    assert capped == 1 << 20

    d["TRAIN"]["USE_MEMORY_LIMIT"] = False
    uncapped = configured_cache_budget(Config(d))
    assert uncapped > capped

    import pandas as pd
    ds = FrameDataset(pd.read_csv(fcsv), fdir, img_dim=(256, 256))
    assert len(ds) * 256 * 256 * 3 > capped  # 3.1 MB of pixels vs 1 MB cap
    cached = maybe_device_cache(ds, "auto", budget=uncapped)
    streamed = maybe_device_cache(ds, "auto", budget=capped)
    assert isinstance(cached, DeviceCachedDataset)
    assert not isinstance(streamed, DeviceCachedDataset)
