"""Binary morphology as jitted XLA ops (the auto-masking compute path).

The reference's mask cleanup is cv2 morphology on the host (reference
``src/data/auto_masking.py:58-90``): elliptical erode (edge-preserve kernel),
elliptical dilate (smoothing kernel), a 5x5 box filter over the per-frame
mask average and a majority vote. Here the same operators run on the TPU as
convolutions: for a binary image B and structuring element S,

    dilate(B, S) = conv(B, S) > 0
    erode(B, S)  = conv(B, S) == sum(S)

— dense convs ride the MXU, so large elliptical kernels are effectively free.
Border semantics match cv2's defaults: erosion treats outside pixels as 1
(so the border is not eaten), dilation as 0.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ellipse_kernel(size: int) -> np.ndarray:
    """Elliptical structuring element, bit-exact with
    ``cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))`` — the
    reference's automask kernels (reference auto_masking.py:58-61). cv2
    anchors the center at ``size // 2`` and fills each row ``i`` over
    ``[c - dx, c + dx]`` with ``dx = cvRound(c * sqrt(r² - dy²) / r)``
    (round-half-to-even, like ``np.rint``); a smooth inside-the-ellipse
    test differs from that at every size (e.g. cv2's 3×3 is the 5-pixel
    cross, not a full box). Pinned against cv2 goldens in
    ``tests/test_morphology.py``."""
    size = max(int(size), 1)
    r = size // 2
    if r == 0:
        return np.ones((1, 1), np.float32)
    c = size // 2
    k = np.zeros((size, size), np.float32)
    for i in range(size):
        dy = i - r
        if abs(dy) <= r:
            dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0)) / r))
            k[i, max(c - dx, 0): min(c + dx + 1, size)] = 1.0
    return k


def _conv2d_same(x: jax.Array, kernel: jax.Array,
                 pad_value: float) -> jax.Array:
    """2-D correlation with SAME geometry and explicit border fill.

    cv2 anchors the structuring element at ``(kh // 2, kw // 2)`` and reads
    the window unflipped for BOTH erode and dilate (verified empirically
    with an asymmetric element), so offsets span ``[-k // 2, +(k - 1) // 2]``
    and the pad split is ``(k // 2, (k - 1) // 2)`` — for even kernels the
    larger pad goes BEFORE, the opposite of the usual SAME convention.
    Getting this backwards shifts even-kernel morphology by one pixel; the
    real automask path uses a 24x24 ellipse (auto_masking.py:58-61)."""
    kh, kw = kernel.shape
    ph0, ph1 = kh // 2, (kh - 1) // 2
    pw0, pw1 = kw // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1)),
                 constant_values=pad_value)
    lhs = xp[:, None, :, :]                          # NCHW
    rhs = kernel[None, None, :, :]                   # OIHW
    out = jax.lax.conv_general_dilated(
        lhs.astype(jnp.float32), rhs.astype(jnp.float32),
        window_strides=(1, 1), padding="VALID")
    return out[:, 0]


def binary_dilate(mask: jax.Array, kernel: jax.Array) -> jax.Array:
    """[B, H, W] binary dilate."""
    conv = _conv2d_same(mask, kernel, pad_value=0.0)
    return (conv > 0.5).astype(mask.dtype)


def binary_erode(mask: jax.Array, kernel: jax.Array) -> jax.Array:
    """[B, H, W] binary erode (cv2 border semantics: outside counts as 1)."""
    conv = _conv2d_same(mask, kernel, pad_value=1.0)
    total = jnp.sum(kernel)
    return (conv >= total - 0.5).astype(mask.dtype)


def box_filter(x: jax.Array, size: int = 5) -> jax.Array:
    """Mean filter (cv2.filter2D with a normalized box, auto_masking.py:87-88;
    cv2's default BORDER_REFLECT_101 border)."""
    k = jnp.ones((size, size), jnp.float32) / (size * size)
    ph = (size - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, size - 1 - ph), (ph, size - 1 - ph)),
                 mode="reflect")
    lhs = xp[:, None, :, :]
    rhs = k[None, None, :, :]
    out = jax.lax.conv_general_dilated(lhs.astype(jnp.float32), rhs,
                                       window_strides=(1, 1), padding="VALID")
    return out[:, 0]


@partial(jax.jit, static_argnames=("erode_size", "dilate_size"))
def clean_binary_masks(binary_masks: jax.Array, *, erode_size: int,
                       dilate_size: int) -> jax.Array:
    """Elliptical erode then dilate of binary masks
    (auto_masking.py:79-83). [B, H, W] in, binary out."""
    binary = binary_masks.astype(jnp.float32)
    er = jnp.asarray(ellipse_kernel(erode_size))
    di = jnp.asarray(ellipse_kernel(dilate_size))
    binary = binary_erode(binary, er)
    binary = binary_dilate(binary, di)
    return binary


@partial(jax.jit, static_argnames=("erode_size", "dilate_size", "threshold"))
def clean_masks(prob_masks: jax.Array, *, erode_size: int, dilate_size: int,
                threshold: float = 0.4) -> jax.Array:
    """Per-frame mask cleanup (auto_masking.py:76-83): threshold the U-Net
    probabilities, elliptical erode then dilate. [B, H, W] in, binary out."""
    return clean_binary_masks((prob_masks > threshold).astype(jnp.float32),
                              erode_size=erode_size,
                              dilate_size=dilate_size)


@jax.jit
def majority_average_mask(binary_masks: jax.Array) -> jax.Array:
    """Average sampled-frame masks, 5x5 smooth, majority vote
    (auto_masking.py:84-90). [B, H, W] in, [H, W] binary out.

    Exact ties (smoothed == n/2, reachable only for even n) map to 1: the
    reference zeroes ``< n/2`` and sets ``> n/2`` to 1, leaving ties at
    the nonzero value n/2 — which downstream behaves as pass-through in
    both ``cv2.bitwise_and`` (any nonzero passes) and the bounding box
    (nonzero counts), i.e. as a 1."""
    total = jnp.sum(binary_masks, axis=0, keepdims=True)
    smoothed = box_filter(total)[0]
    n = binary_masks.shape[0]
    return (smoothed >= n / 2.0).astype(jnp.float32)


def bounding_box(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """[min_row, max_row, min_col, max_col] of nonzero area (reference
    ``get_bounding_box``, auto_masking.py:24-26)."""
    i, j = np.where(np.asarray(mask))
    if len(i) == 0:
        h, w = mask.shape
        return (0, h - 1, 0, w - 1)
    return (int(i.min()), int(i.max()), int(j.min()), int(j.max()))
