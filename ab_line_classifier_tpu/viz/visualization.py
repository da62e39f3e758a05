"""Plotting / reporting (reference ``src/visualization/visualization.py``):
ROC curves, confusion matrices, Grad-CAM heatmap panels, sweep and
threshold-experiment visualizations, written as PNGs under
``results/figures`` / ``img/`` exactly like the reference's file contract.
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, List, Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from sklearn.metrics import auc, confusion_matrix, roc_curve


def _ts() -> str:
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def fig_to_array(fig: plt.Figure) -> np.ndarray:
    """Render a matplotlib figure to a uint8 [H, W, 3] RGB array — the
    reference's ``plot_to_tensor`` (visualization.py:17-30), which rasterizes
    figures into image tensors for the experiment tracker; here the tracker
    backends take the ndarray directly (``tracker.log_image``)."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def plot_roc(name: str, labels: np.ndarray, probs: np.ndarray,
             class_names: Sequence[str],
             dir_path: Optional[str] = None) -> plt.Figure:
    """Per-class ROC curves (reference visualization.py:67-99)."""
    fig, ax = plt.subplots(figsize=(7, 6))
    labels = np.asarray(labels)
    plotted = 0
    for i, cname in enumerate(class_names):
        y_true = (labels == i).astype(int)
        if len(np.unique(y_true)) < 2:
            continue
        fpr, tpr, _ = roc_curve(y_true, np.asarray(probs)[:, i])
        ax.plot(fpr, tpr, label=f"{cname} (AUC = {auc(fpr, tpr):.3f})")
        plotted += 1
    ax.plot([0, 1], [0, 1], "k--", lw=0.8)
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    ax.set_title(f"ROC — {name}")
    if plotted:
        ax.legend(loc="lower right")
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        fig.savefig(os.path.join(dir_path, f"roc_{name}_{_ts()}.png"),
                    dpi=120)
        plt.close(fig)
    return fig


def plot_confusion_matrix(labels: np.ndarray, preds: np.ndarray,
                          class_names: Sequence[str],
                          dir_path: Optional[str] = None) -> plt.Figure:
    """Confusion-matrix heatmap (reference visualization.py:102-139)."""
    cm = confusion_matrix(np.asarray(labels), np.asarray(preds),
                          labels=list(range(len(class_names))))
    fig, ax = plt.subplots(figsize=(5.5, 5))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(class_names)), class_names)
    ax.set_yticks(range(len(class_names)), class_names)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    thresh = cm.max() / 2.0 if cm.max() else 0.5
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                    color="white" if cm[i, j] > thresh else "black")
    fig.colorbar(im)
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        fig.savefig(os.path.join(dir_path, f"cm_{_ts()}.png"), dpi=120)
        plt.close(fig)
    return fig


def visualize_heatmap(orig_img: np.ndarray, heatmap_img: np.ndarray,
                      img_filename: str, label: int, probs: np.ndarray,
                      class_names: Sequence[str],
                      dir_path: Optional[str] = None) -> plt.Figure:
    """Side-by-side original/Grad-CAM panel with prediction annotations
    (reference visualization.py:32-64), saved to ``img/heatmaps``."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(orig_img.astype(np.uint8))
    axes[0].set_title("Original")
    axes[1].imshow(heatmap_img.astype(np.uint8))
    axes[1].set_title("Grad-CAM")
    for ax in axes:
        ax.axis("off")
    pred_idx = int(np.argmax(probs))
    fig.suptitle(
        f"{os.path.basename(img_filename)}  |  true: {class_names[label]}  "
        f"pred: {class_names[pred_idx]} "
        f"(p={float(np.max(probs)):.3f})")
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        base = os.path.splitext(os.path.basename(img_filename))[0]
        fig.savefig(os.path.join(dir_path, f"heatmap_{base}_{_ts()}.png"),
                    dpi=120)
        plt.close(fig)
    return fig


def plot_hparam_search(trials: List[Dict], objective_key: str = "objective",
                       goal: str = "maximize",
                       dir_path: Optional[str] = None) -> plt.Figure:
    """Sweep progress plot — objective vs trial with running best. ``goal``
    must match the metric's direction: lr_search_parallel trial rows carry
    the raw metric (possibly minimize), while the serial sweep's objectives
    are sign-normalized to maximize."""
    objs = [t[objective_key] for t in trials]
    best = (np.maximum.accumulate(objs) if goal == "maximize"
            else np.minimum.accumulate(objs))
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(objs, "o-", label="trial objective")
    ax.plot(best, "r--", label="running best")
    ax.set_xlabel("Trial")
    ax.set_ylabel("Objective")
    ax.legend()
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        fig.savefig(os.path.join(dir_path, f"hparam_search_{_ts()}.png"),
                    dpi=120)
        plt.close(fig)
    return fig


def plot_bayesian_hparam_opt(controller, dir_path: Optional[str] = None
                             ) -> plt.Figure:
    """Objective landscape of a Bayesian sweep — the skopt ``plot_objective``
    analogue (reference visualization.py:142-178): per-variable 1-D partial
    dependence of the GP posterior mean, with observed trials overlaid.
    ``controller`` is a ``BayesController`` (duck-typed: needs ``space``,
    ``history``, ``partial_dependence``)."""
    space = controller.space
    n = len(space)
    fig, axes = plt.subplots(1, n, figsize=(4.5 * n, 4), squeeze=False)
    for ax, var in zip(axes[0], space):
        values, pd = controller.partial_dependence(var.name)
        xs = [p[var.name] for p, _ in controller.history]
        ys = [o for _, o in controller.history]
        if var.type == "set":
            pos = {val: i for i, val in enumerate(values)}
            ax.plot(range(len(values)), pd, "o-", label="GP partial dep.")
            ax.scatter([pos[x] for x in xs], ys, s=18, c="crimson",
                       alpha=0.6, label="trials")
            ax.set_xticks(range(len(values)), [str(v) for v in values])
        else:
            ax.plot(values, pd, "-", label="GP partial dep.")
            ax.scatter(xs, ys, s=18, c="crimson", alpha=0.6, label="trials")
            if var.type == "float_log":
                ax.set_xscale("log")
        ax.set_xlabel(var.name)
        ax.set_ylabel("objective")
    axes[0][0].legend(loc="best", fontsize=8)
    fig.suptitle("Bayesian hyperparameter search — GP partial dependence")
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        fig.savefig(os.path.join(dir_path, f"bayes_opt_{_ts()}.png"), dpi=120)
        plt.close(fig)
    return fig


def plot_b_line_threshold_experiment(metrics_df, min_t: int, max_t: int,
                                     threshold_col: str, class_thresh: float,
                                     dir_path: Optional[str] = None
                                     ) -> plt.Figure:
    """Metric curves across B-line count thresholds (reference
    visualization.py:181-218)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for col in ("precision", "recall", "specificity", "f1", "accuracy"):
        if col in metrics_df:
            ax.plot(metrics_df[threshold_col], metrics_df[col], "o-",
                    label=col)
    ax.set_xlabel(threshold_col)
    ax.set_ylabel("Metric value")
    ax.set_title(f"Clip metrics vs {threshold_col} "
                 f"(frame threshold {class_thresh})")
    ax.legend()
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        fig.savefig(os.path.join(dir_path, f"threshold_exp_{_ts()}.png"),
                    dpi=120)
        plt.close(fig)
    return fig


def plot_b_line_threshold_roc_curve(tprs: Sequence[float],
                                    fprs: Sequence[float],
                                    dir_path: Optional[str] = None
                                    ) -> plt.Figure:
    """ROC over count thresholds with trapezoid AUC (reference
    visualization.py:222-247)."""
    order = np.argsort(fprs)
    f = np.asarray(fprs)[order]
    t = np.asarray(tprs)[order]
    # np.trapezoid is numpy >= 2.0; fall back to the 1.x name.
    _trap = getattr(np, "trapezoid", None) or np.trapz
    area = float(_trap(t, f)) if len(f) > 1 else 0.0
    fig, ax = plt.subplots(figsize=(6, 5.5))
    ax.plot(f, t, "o-", label=f"AUC = {area:.3f}")
    ax.plot([0, 1], [0, 1], "k--", lw=0.8)
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    ax.legend()
    fig.tight_layout()
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
        fig.savefig(os.path.join(dir_path, f"threshold_roc_{_ts()}.png"),
                    dpi=120)
        plt.close(fig)
    return fig
