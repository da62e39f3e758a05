"""Streaming classification metrics as a jit-safe accumulator pytree.

The reference tracks accuracy, AUC, and per-class Precision/Recall at
threshold ``1/n_classes`` during training via Keras metric objects (reference
``src/train.py:108-115``). Keras's ``AUC`` is a binned approximation
(200 thresholds, micro-averaged over every class column when fed softmax
output) whose default ``summation_method='interpolation'`` on the ROC curve
is exactly the trapezoid over the binned (fpr, tpr) points — reproduced here
bit-for-bit (same threshold placement, half-open comparisons, flattening;
pinned to ``tf.keras.metrics.AUC`` by
``tests/test_keras_parity.py::TestStreamingAUCExactness``).

Design: :class:`MetricsState` holds only *sums* (confusion counts per
threshold bin, correct counts, loss totals), so it

* updates inside a jitted train/eval step at negligible cost,
* reduces across a data-parallel mesh with a single ``psum`` (all fields are
  additive),
* finalizes to scalars on host at epoch end.

Exact (sklearn) metrics for final test evaluation live in
``ab_line_classifier_tpu.predict.metrics`` — mirroring the reference's split
between Keras training metrics and sklearn evaluation metrics
(``predict.py:89-122``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

_EPS = 1e-7


@struct.dataclass
class MetricsState:
    """Additive metric accumulators. Shapes: ``auc_*`` are
    ``[n_thresholds]``; ``cls_*`` are ``[n_classes]``; the rest scalars."""

    n: jax.Array            # number of examples
    correct: jax.Array      # argmax-accuracy numerator
    loss_sum: jax.Array     # summed per-example loss
    auc_tp: jax.Array
    auc_fp: jax.Array
    auc_tn: jax.Array
    auc_fn: jax.Array
    cls_tp: jax.Array       # per-class counts at the fixed P/R threshold
    cls_fp: jax.Array
    cls_fn: jax.Array


def auc_thresholds(num_thresholds: int = 200) -> jax.Array:
    """Keras AUC threshold placement: ``num_thresholds - 2`` interior points
    plus ``-eps`` and ``1+eps`` endpoints."""
    inner = (jnp.arange(1, num_thresholds - 1, dtype=jnp.float32)
             / (num_thresholds - 1))
    return jnp.concatenate([jnp.array([-_EPS], jnp.float32), inner,
                            jnp.array([1.0 + _EPS], jnp.float32)])


def init_metrics(n_classes: int, num_thresholds: int = 200) -> MetricsState:
    z = jnp.zeros((), jnp.float32)
    zt = jnp.zeros((num_thresholds,), jnp.float32)
    zc = jnp.zeros((n_classes,), jnp.float32)
    return MetricsState(n=z, correct=z, loss_sum=z, auc_tp=zt, auc_fp=zt,
                        auc_tn=zt, auc_fn=zt, cls_tp=zc, cls_fp=zc, cls_fn=zc)


def update_metrics(state: MetricsState, probs: jax.Array, labels: jax.Array,
                   loss: Optional[jax.Array] = None,
                   sample_mask: Optional[jax.Array] = None) -> MetricsState:
    """Accumulate a batch.

    :param probs: ``[B, C]`` softmax probabilities.
    :param labels: ``[B, C]`` one-hot (or ``[B]`` integer) labels.
    :param loss: optional ``[B]`` per-example loss values.
    :param sample_mask: optional ``[B]`` validity mask (for padded batches —
        static batch shapes are kept for XLA; remainders are masked, not
        dynamically shaped).
    """
    probs = probs.astype(jnp.float32)
    n_classes = probs.shape[-1]
    if labels.ndim == probs.ndim - 1:
        labels = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    labels = labels.astype(jnp.float32)
    if sample_mask is None:
        sample_mask = jnp.ones(probs.shape[0], jnp.float32)
    m = sample_mask.astype(jnp.float32)

    # Accuracy (argmax).
    pred_cls = jnp.argmax(probs, axis=-1)
    true_cls = jnp.argmax(labels, axis=-1)
    correct = jnp.sum((pred_cls == true_cls) * m)

    # Binned AUC, micro over all class columns (Keras AUC on softmax output).
    th = auc_thresholds(state.auc_tp.shape[0])            # [T]
    p_flat = probs.reshape(-1)                            # [B*C]
    y_flat = labels.reshape(-1)
    m_flat = jnp.repeat(m, n_classes)
    pred_pos = (p_flat[None, :] > th[:, None]).astype(jnp.float32)  # [T, B*C]
    w_pos = y_flat * m_flat
    w_neg = (1.0 - y_flat) * m_flat
    tp = pred_pos @ w_pos
    fp = pred_pos @ w_neg
    fn = jnp.sum(w_pos) - tp
    tn = jnp.sum(w_neg) - fp

    # Per-class P/R at threshold 1/n_classes (reference train.py:110-115).
    cls_th = 1.0 / n_classes
    cls_pred = (probs > cls_th).astype(jnp.float32) * m[:, None]
    cls_tp = jnp.sum(cls_pred * labels, axis=0)
    cls_fp = jnp.sum(cls_pred * (1.0 - labels), axis=0)
    cls_fn = jnp.sum((1.0 - cls_pred) * labels * m[:, None], axis=0)

    loss_sum = state.loss_sum
    if loss is not None:
        loss_sum = loss_sum + jnp.sum(loss * m)

    return MetricsState(
        n=state.n + jnp.sum(m), correct=state.correct + correct,
        loss_sum=loss_sum,
        auc_tp=state.auc_tp + tp, auc_fp=state.auc_fp + fp,
        auc_tn=state.auc_tn + tn, auc_fn=state.auc_fn + fn,
        cls_tp=state.cls_tp + cls_tp, cls_fp=state.cls_fp + cls_fp,
        cls_fn=state.cls_fn + cls_fn)


def reduce_metrics(state: MetricsState, axis_name: str) -> MetricsState:
    """Sum accumulators across a mesh axis (all fields additive)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), state)


def compute_metrics(state: MetricsState, class_names=None) -> Dict[str, jax.Array]:
    """Finalize to scalars (host or device)."""
    n = jnp.maximum(state.n, 1.0)
    tpr = state.auc_tp / jnp.maximum(state.auc_tp + state.auc_fn, _EPS)
    fpr = state.auc_fp / jnp.maximum(state.auc_fp + state.auc_tn, _EPS)
    # Thresholds ascend => fpr/tpr descend; trapezoid over descending curve.
    auc = jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)

    precision = state.cls_tp / jnp.maximum(state.cls_tp + state.cls_fp, _EPS)
    recall = state.cls_tp / jnp.maximum(state.cls_tp + state.cls_fn, _EPS)

    out = {
        "loss": state.loss_sum / n,
        "accuracy": state.correct / n,
        "auc": auc,
    }
    n_classes = state.cls_tp.shape[0]
    names = class_names or [str(i) for i in range(n_classes)]
    for i, cname in enumerate(names):
        out[f"precision_{cname}"] = precision[i]
        out[f"recall_{cname}"] = recall[i]
    return out
