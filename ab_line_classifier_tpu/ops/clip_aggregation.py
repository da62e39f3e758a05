"""On-device clip-level aggregation of frame predictions.

The reference aggregates frame probabilities into clip predictions on the host
with Python loops (reference ``src/predict.py:159-166``): ``average`` is a
NumPy mean, ``sliding_window`` a Python loop of windowed means
(``predict.py:365-376``), and ``contiguous`` a Python run-length loop
(``predict.py:283-308``). Here all three are vectorized XLA ops over a padded
``[n_clips, max_frames, n_classes]`` batch with a frame-validity mask, so an
entire dataset's clip predictions happen in one compiled device program:

* ``average`` — masked mean over frames.
* ``sliding_window`` — max over all length-W windowed means of the B-line
  probability, computed from a cumulative sum (O(N), no loop).
* ``contiguous`` — longest run of frames whose B-line probability exceeds the
  classification threshold, via a cumsum/cummax run-length identity
  (O(N), no scan carry chain).

All functions accept ``probs`` of shape ``[..., T, C]`` and a boolean or
0/1 ``mask`` of shape ``[..., T]`` marking valid frames, and return clip
probabilities of shape ``[..., C]`` matching the reference's conventions
(binary: column 1 is the B-line probability).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _default_mask(probs, mask):
    if mask is None:
        return jnp.ones(probs.shape[:-1], dtype=probs.dtype)
    return mask.astype(probs.dtype)


def average_clip_probs(probs: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Masked mean over the frame axis (reference ``np.mean(pred_probs, 0)``,
    predict.py:163-164).

    Sum and count accumulate in float32 regardless of the prob dtype: a
    bf16 count saturates at 256 (257 is unrepresentable) and a bf16 prob
    sum loses low bits, so long clips would get means off by percents.
    The mean is cast back to the input dtype."""
    m = _default_mask(probs, mask).astype(jnp.float32)
    total = jnp.sum(probs.astype(jnp.float32) * m[..., None], axis=-2)
    count = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    return (total / count).astype(probs.dtype)


def max_contiguous_positive(preds: jax.Array,
                            mask: Optional[jax.Array] = None) -> jax.Array:
    """Longest run of 1s in a binary prediction sequence — the vectorized
    ``max_contiguous_b_line_preds`` (reference predict.py:283-297).

    Uses the identity: with s = cumsum(b) and z_i = max_{j<=i, b_j=0}(s_j)
    (0 if no zero yet), the run length ending at i is s_i - z_i; the answer is
    the max over i. Implemented with cumsum + cummax, both O(N) XLA ops.

    :param preds: int/bool array [..., T] of framewise positive predictions.
    :param mask: optional [..., T] validity mask; padding counts as a 0
        (run-breaker), which matches the reference operating on exact-length
        arrays.
    """
    b = preds.astype(jnp.int32)
    if mask is not None:
        b = b * mask.astype(jnp.int32)
    s = jnp.cumsum(b, axis=-1)
    # s value at the most recent zero-position (0 before any zero).
    zero_marks = jnp.where(b == 0, s, 0)
    z = jax.lax.cummax(zero_marks, axis=b.ndim - 1)
    runs = s - z
    return jnp.max(runs, axis=-1)


def contiguous_clip_probs(probs: jax.Array, contiguity_threshold: int,
                          classification_threshold: float,
                          mask: Optional[jax.Array] = None) -> jax.Array:
    """The ``contiguous`` algorithm (reference predict.py:299-308): clip is
    positive iff >= contiguity_threshold consecutive frames have B-line
    probability strictly above the classification threshold; returns hard
    {0,1} pseudo-probabilities ``[1-p, p]`` like the reference."""
    b_preds = (probs[..., 1] > classification_threshold)
    max_run = max_contiguous_positive(b_preds, mask)
    clip_pred = (max_run >= contiguity_threshold).astype(probs.dtype)
    return jnp.stack([1.0 - clip_pred, clip_pred], axis=-1)


def sliding_window_clip_probs(probs: jax.Array, window: int,
                              mask: Optional[jax.Array] = None) -> jax.Array:
    """The ``sliding_window`` algorithm (reference predict.py:365-376):
    highest mean B-line probability over any ``window`` consecutive frames,
    returned as ``[1-p, p]``.

    Matches the reference's edge case exactly: when a clip has fewer valid
    frames than ``window`` the loop body never runs and the result is 0.

    The prefix sum accumulates in float32 regardless of the prob dtype: a
    bf16 cumsum near T=300 has a resolution of 2.0, so window differences
    ``s[i+W]-s[i]`` would be off by whole units on long clips. The result
    is cast back to the input dtype.
    """
    m = _default_mask(probs, mask)
    b = (probs[..., 1] * m).astype(jnp.float32)
    T = b.shape[-1]
    # Prefix sums with a leading zero: w_i = (s[i+W] - s[i]) / W for window
    # starting at i.
    s = jnp.cumsum(b, axis=-1)
    s = jnp.concatenate([jnp.zeros_like(s[..., :1]), s], axis=-1)
    if T < window:
        max_b = jnp.zeros(probs.shape[:-2], dtype=probs.dtype)
        return jnp.stack([1.0 - max_b, max_b], axis=-1)
    win_sums = s[..., window:] - s[..., :-window]  # [..., T-W+1]
    win_means = win_sums / float(window)
    # A window is only valid if it lies entirely within the clip's valid
    # frames: window starting at i valid iff i + W <= n_valid. With padding
    # zeros the means of invalid windows could still be > 0, so mask them.
    # Validity arithmetic in int32: frame indices/counts above 256 are not
    # exactly representable in low-precision prob dtypes (e.g. bf16).
    n_valid = jnp.sum(m.astype(jnp.int32), axis=-1, keepdims=True)  # [..., 1]
    starts = jnp.arange(win_means.shape[-1], dtype=jnp.int32)
    valid = (starts + window) <= n_valid  # [..., T-W+1]
    win_means = jnp.where(valid, win_means, -jnp.inf)
    max_b = jnp.max(win_means, axis=-1)
    # Clips shorter than the window: no valid window -> 0 (reference behavior).
    max_b = jnp.where(jnp.isfinite(max_b), max_b, 0.0).astype(probs.dtype)
    return jnp.stack([1.0 - max_b, max_b], axis=-1)


@partial(jax.jit, static_argnames=("algorithm", "contiguity_threshold",
                                   "window"))
def aggregate_clips(probs: jax.Array, mask: jax.Array, *, algorithm: str,
                    classification_threshold: float = 0.5,
                    contiguity_threshold: int = 3,
                    window: int = 4) -> jax.Array:
    """Dispatch over the three algorithms (reference predict.py:159-166)."""
    if algorithm == "average":
        return average_clip_probs(probs, mask)
    if algorithm == "contiguous":
        return contiguous_clip_probs(probs, contiguity_threshold,
                                     classification_threshold, mask)
    if algorithm == "sliding_window":
        return sliding_window_clip_probs(probs, window, mask)
    raise ValueError(f'Unknown value for "clip_algorithm" argument: {algorithm!r}')
