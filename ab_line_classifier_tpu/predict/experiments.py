"""Offline evaluation experiments over saved frame predictions.

Ports of the reference's threshold harnesses (``src/predict.py:225-272`` and
``:379-423``): sweep the clip-level decision rule over a saved frame-wise
prediction CSV and emit metrics tables + plots. The reference loops in
pandas/NumPy per threshold; here the per-clip statistics (contiguous run
lengths, windowed means) are computed once as vectorized ops and the
threshold sweep reuses them.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ab_line_classifier_tpu.config import Config
from ab_line_classifier_tpu.ops import clip_aggregation as agg
from ab_line_classifier_tpu.predict.metrics import compute_metrics
from ab_line_classifier_tpu.predict.predict import load_class_idx_map

CLIP = "Clip"
PRED_CLASS = "Pred Class"
CLASS_NUM = "Class"
B_PROB = "b_lines"
A_PROB = "a_lines"
B_LINE_THRESHOLD = "B-line Threshold"
SLIDING_WINDOW = "Sliding Window Length"


def _ts() -> str:
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def _clip_groups(preds_df: pd.DataFrame):
    """Frame rows -> padded per-clip arrays (clip = Frame Path up to the last
    underscore, reference predict.py:239)."""
    df = preds_df.copy()
    df[CLIP] = df["Frame Path"].astype(str).str.rpartition("_")[0]
    clips = df.groupby(CLIP, sort=True)
    names = list(clips.groups)
    max_t = max(len(g) for _, g in clips)
    b_probs = np.zeros((len(names), max_t), np.float32)
    mask = np.zeros((len(names), max_t), np.float32)
    labels = np.zeros(len(names), np.int64)
    for i, (_, g) in enumerate(clips):
        t = len(g)
        b_probs[i, :t] = g[B_PROB].to_numpy()
        mask[i, :t] = 1.0
        labels[i] = g[CLASS_NUM].max()
    return names, b_probs, mask, labels, df


def b_line_threshold_experiment(cfg: Config, frame_preds_path: str,
                                min_b_lines: int, max_b_lines: int,
                                class_thresh: float = 0.5,
                                contiguous: bool = True,
                                document: bool = False) -> pd.DataFrame:
    """Reference ``b_line_threshold_experiment`` (predict.py:225-272): vary
    the count of predicted-B-line frames needed to call a clip pathological."""
    preds_df = pd.read_csv(frame_preds_path)
    names, b_probs, mask, labels, df = _clip_groups(preds_df)
    frame_pos = (b_probs >= class_thresh).astype(np.int32)

    if contiguous:
        n_b_col = "Contiguous Predicted B-lines"
        counts = np.asarray(agg.max_contiguous_positive(
            jnp.asarray(frame_pos), jnp.asarray(mask)))
    else:
        n_b_col = "Total Predicted B-lines"
        counts = (frame_pos * mask).sum(axis=1).astype(np.int64)

    df[PRED_CLASS] = df[B_PROB].ge(class_thresh).astype(int)
    os.makedirs(cfg["PATHS"]["EXPERIMENTS"], exist_ok=True)
    df.to_csv(os.path.join(cfg["PATHS"]["EXPERIMENTS"], "preds.csv"),
              index=False)

    idx_map = load_class_idx_map(cfg)
    rows = []
    tprs, fprs = [], []
    for threshold in range(min_b_lines, max_b_lines + 1):
        clip_preds = (counts >= threshold).astype(int)
        m = compute_metrics(cfg.classes, labels, clip_preds,
                            class_idx_map=idx_map)
        rows.append(pd.json_normalize(m, sep="_"))
        tprs.append(m["recall"])
        fprs.append(1.0 - m["specificity"])
    metrics_df = pd.concat(rows, axis=0, ignore_index=True)
    metrics_df.insert(0, B_LINE_THRESHOLD,
                      np.arange(min_b_lines, max_b_lines + 1))

    if document:
        from ab_line_classifier_tpu.viz.visualization import (
            plot_b_line_threshold_experiment, plot_b_line_threshold_roc_curve)
        viz_dir = cfg["PATHS"]["EXPERIMENT_VISUALIZATIONS"]
        plot_b_line_threshold_experiment(metrics_df, min_b_lines, max_b_lines,
                                         B_LINE_THRESHOLD, class_thresh,
                                         dir_path=viz_dir)
        metrics_df.to_csv(os.path.join(
            cfg["PATHS"]["EXPERIMENTS"], f"b-line_thresholds_{_ts()}.csv"),
            index=False)
        clips_out = pd.DataFrame({CLIP: names, CLASS_NUM: labels,
                                  n_b_col: counts})
        clips_out.to_csv(os.path.join(
            cfg["PATHS"]["EXPERIMENTS"],
            f"clip_contiguous_preds_{_ts()}.csv"), index=True)
        plot_b_line_threshold_roc_curve(tprs, fprs, dir_path=viz_dir)
    return metrics_df


def sliding_window_variation_experiment(cfg: Config, frame_preds_path: str,
                                        min_window_length: int,
                                        max_window_length: int,
                                        class_thresh: float = 0.5,
                                        document: bool = False) -> pd.DataFrame:
    """Reference ``sliding_window_variation_experiment`` (predict.py:379-423):
    vary the averaging window of the highest-contiguous-mean rule."""
    preds_df = pd.read_csv(frame_preds_path)
    names, b_probs, mask, labels, _ = _clip_groups(preds_df)
    probs3 = np.stack([1.0 - b_probs, b_probs], axis=-1)

    idx_map = load_class_idx_map(cfg)
    rows = []
    last_clips_df = None
    for window in range(min_window_length, max_window_length + 1):
        clip_probs = np.asarray(agg.sliding_window_clip_probs(
            jnp.asarray(probs3), window, jnp.asarray(mask)))
        clip_preds = (clip_probs[:, 1] >= class_thresh).astype(int)
        m = compute_metrics(cfg.classes, labels, clip_preds, clip_probs,
                            class_idx_map=idx_map)
        rows.append(pd.json_normalize(m, sep="_"))
        last_clips_df = pd.DataFrame({CLIP: names, CLASS_NUM: labels,
                                      B_PROB: clip_probs[:, 1],
                                      A_PROB: clip_probs[:, 0]})
    metrics_df = pd.concat(rows, axis=0, ignore_index=True)
    metrics_df.insert(0, SLIDING_WINDOW,
                      np.arange(min_window_length, max_window_length + 1))

    if document:
        from ab_line_classifier_tpu.viz.visualization import (
            plot_b_line_threshold_experiment)
        os.makedirs(cfg["PATHS"]["EXPERIMENTS"], exist_ok=True)
        plot_b_line_threshold_experiment(
            metrics_df, min_window_length, max_window_length, SLIDING_WINDOW,
            class_thresh, dir_path=cfg["PATHS"]["EXPERIMENT_VISUALIZATIONS"])
        metrics_df.to_csv(os.path.join(
            cfg["PATHS"]["EXPERIMENTS"],
            f"sliding_window_exp_c{class_thresh}_{_ts()}.csv"), index=False)
        last_clips_df.to_csv(os.path.join(
            cfg["PATHS"]["EXPERIMENTS"],
            f"clip_sliding_window_preds_c{class_thresh}_{_ts()}.csv"),
            index=True)
    return metrics_df


def predict_clipwise_with_contiguity_threshold_wb(
        preds: pd.DataFrame, target_class: str, contiguity_threshold: int,
        classification_threshold: float) -> bool:
    """WaveBase-CSV contiguity rule (reference predict.py:310-326)."""
    cur = 0
    for i in range(preds.shape[0]):
        if (preds.iloc[i, 0] == target_class
                and float(preds.iloc[i, 1]) > classification_threshold):
            cur += 1
        else:
            cur = 0
        if cur >= contiguity_threshold:
            return True
    return False


def compute_clip_predictions_wb(cfg: Config,
                                target_class: str = "B-Lines") -> pd.DataFrame:
    """Clip-wise predictions from WaveBase-exported framewise CSVs
    (reference predict.py:328-362)."""
    rootdir = cfg["PATHS"]["RT_ROOT_DIR"]
    recording_dir = "recordings"
    res = []
    dated_dirs = next(os.walk(rootdir))[1] if os.path.isdir(rootdir) else []
    for dated_dir in dated_dirs:
        rec_root = os.path.join(rootdir, dated_dir, recording_dir)
        for root, _, files in os.walk(rec_root):
            for csv in [f for f in files if ".csv" in f]:
                clip_name = csv.replace("_probs.csv", ".mkv")
                data = pd.read_csv(os.path.join(root, csv), delimiter=",",
                                   header=None, dtype=str)
                positive = predict_clipwise_with_contiguity_threshold_wb(
                    data, target_class,
                    int(cfg["CLIP_PREDICTION"]["CONTIGUITY_THRESHOLD"]),
                    float(cfg["CLIP_PREDICTION"]["CLASSIFICATION_THRESHOLD"]))
                res.append([clip_name, "B-Line" if positive else "A-Line"])
    res_df = pd.DataFrame(res, columns=["filename", "prediction"])
    os.makedirs(cfg["PATHS"]["BATCH_PREDS"], exist_ok=True)
    ct = cfg["CLIP_PREDICTION"]["CONTIGUITY_THRESHOLD"]
    thresh_str = str(cfg["CLIP_PREDICTION"]["CLASSIFICATION_THRESHOLD"])
    tag = thresh_str[2] if len(thresh_str) > 2 else "0"
    res_df.to_csv(os.path.join(
        cfg["PATHS"]["BATCH_PREDS"],
        f"{os.path.basename(os.path.normpath(rootdir))}_clip_predictions_"
        f"T{ct}_t0{tag}_{_ts()}.csv"), index=False)
    return res_df
