"""Class-imbalance handling: loss weights and output-bias prior.

Formulas match the reference exactly:

* class weights ``w_i = (1/n_classes) * N / n_i`` from the training-set class
  histogram (reference ``src/train.py:41-68``);
* output bias = per-class log-odds prior ``log(n_i / (N - n_i))`` used to
  initialize the final Dense bias (reference ``src/train.py:71-81``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


def class_histogram(train_df: pd.DataFrame, class_key: str = "Class") -> np.ndarray:
    return np.bincount(train_df[class_key].to_numpy().astype(int))


def compute_class_weight(train_df: pd.DataFrame,
                         class_key: str = "Class") -> Dict[int, float]:
    hist = class_histogram(train_df, class_key)
    total = hist.sum()
    n = len(hist)
    return {i: float((1.0 / n) * total / hist[i]) for i in range(n)}


def class_weight_array(train_df: pd.DataFrame, n_classes: int,
                       class_key: str = "Class") -> np.ndarray:
    """Vector form of :func:`compute_class_weight` for stacked/vmapped
    trainers ([C] float32). Absent classes get a guarded count of 1 so the
    weight stays finite (they contribute no loss anyway)."""
    hist = np.bincount(train_df[class_key].to_numpy().astype(int),
                       minlength=n_classes).astype(np.float64)
    total = hist.sum()
    return ((1.0 / n_classes) * total
            / np.maximum(hist, 1)).astype(np.float32)


def compute_output_bias(train_df: pd.DataFrame,
                        class_key: str = "Class") -> np.ndarray:
    hist = class_histogram(train_df, class_key).astype(np.float64)
    total = hist.sum()
    return np.log(hist / (total - hist)).astype(np.float32)


def output_bias_array(train_df: pd.DataFrame, n_classes: int,
                      class_key: str = "Class") -> np.ndarray:
    """Fixed-width [C] form of :func:`compute_output_bias` for stacked/
    vmapped trainers. Classes absent from a (small) fold get a guarded
    count of 1 so the log-odds prior stays finite."""
    hist = np.bincount(train_df[class_key].to_numpy().astype(int),
                       minlength=n_classes).astype(np.float64)
    # Total over the RAW counts (same convention as class_weight_array and
    # the reference formula log(n_i/(N-n_i))); only the per-class count is
    # clamped so absent classes stay finite.
    total = hist.sum()
    hist = np.maximum(hist, 1.0)
    return np.log(hist / np.maximum(total - hist, 1.0)).astype(np.float32)
