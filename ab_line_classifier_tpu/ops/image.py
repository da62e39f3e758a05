"""Device-side image ops: nearest-neighbor resize semantics and the fused
decode-to-model-input preprocessing path.

The reference resizes with ``tf.image.resize(..., NEAREST_NEIGHBOR)`` during
training (reference ``src/data/preprocessor.py:80``) and with
``cv2.resize(..., INTER_NEAREST)`` on-device (reference ``src/deploy.py:28``)
— two subtly different index mappings. Both are provided here as *precomputed
static gathers*: for fixed (src, dst) shapes the source index of every output
pixel is a compile-time constant vector, so resize + dtype cast + per-model
normalization compiles to a single fused XLA program (one pass over HBM).

``resize_mode``:
* ``'tf'``  — half-pixel centers: ``src = floor((i + 0.5) * scale)`` (TF2
  nearest-neighbor default).
* ``'cv2'`` — OpenCV INTER_NEAREST: ``src = floor(i * scale)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.models.preprocess import preprocess_affine_params


def nearest_indices(src: int, dst: int, mode: str = "tf") -> np.ndarray:
    """Static source indices for 1-D nearest-neighbor resize."""
    scale = src / dst
    i = np.arange(dst, dtype=np.float64)
    if mode == "tf":
        idx = np.floor((i + 0.5) * scale)
    elif mode == "cv2":
        idx = np.floor(i * scale)
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    return np.clip(idx, 0, src - 1).astype(np.int32)


def nearest_resize(x: jax.Array, out_hw: Tuple[int, int],
                   mode: str = "tf") -> jax.Array:
    """Nearest-neighbor resize of NHWC (or HWC) images via static gather."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        ridx = jnp.asarray(nearest_indices(h, oh, mode))
        cidx = jnp.asarray(nearest_indices(w, ow, mode))
        x = x[:, ridx][:, :, cidx]
    return x[0] if squeeze else x


@partial(jax.jit, static_argnames=("out_hw", "preprocess_mode", "resize_mode",
                                   "out_dtype", "blank_ui_region"))
def fused_preprocess(frames: jax.Array, *, out_hw: Tuple[int, int] = (128, 128),
                     preprocess_mode: str = "scale", resize_mode: str = "tf",
                     mask: Optional[jax.Array] = None,
                     out_dtype=jnp.float32,
                     blank_ui_region: bool = False) -> jax.Array:
    """The full frame -> model-input hot path in one compiled program:

    uint8 NHWC frames -> [optional WaveBase UI blank] -> [optional beam-mask
    multiply] -> nearest resize -> float cast -> per-model channelwise-affine
    normalization (+ BGR swap for caffe mode) -> ``out_dtype``.

    Replaces the reference chain of tf.data map stages (decode happens on
    host; everything after ``decode_jpeg`` from ``preprocessor.py:69-80`` plus
    the model scaling at ``:59-63`` is fused here). ``blank_ui_region`` zeroes
    the 50x160 top-left UI box exactly like on-device inference does
    (reference ``deploy.py:56``).
    """
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[None]
    x = frames
    if blank_ui_region:
        h = min(50, x.shape[1])
        w = min(160, x.shape[2])
        region_mask = jnp.ones((x.shape[1], x.shape[2]), dtype=x.dtype)
        region_mask = region_mask.at[:h, :w].set(0)
        x = x * region_mask[None, :, :, None]
    if mask is not None:
        x = x * mask.astype(x.dtype)[None, :, :, None]

    perm, scale, bias = preprocess_affine_params(preprocess_mode)
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    needs_perm = not np.array_equal(perm, np.arange(3))
    if (h, w) != (oh, ow):
        ridx = jnp.asarray(nearest_indices(h, oh, resize_mode))
        cidx = jnp.asarray(nearest_indices(w, ow, resize_mode))
        x = x[:, ridx][:, :, cidx]
        if needs_perm:
            x = x[..., jnp.asarray(perm)]
            needs_perm = False
    if needs_perm:
        x = x[..., jnp.asarray(perm)]

    x = x.astype(jnp.float32)
    x = x * jnp.asarray(scale) + jnp.asarray(bias)
    x = x.astype(out_dtype)
    # 3-D input -> 3-D output, matching nearest_resize and the Pallas path
    # (preprocess_pallas squeezes too) so single-frame callers get the same
    # rank on every backend.
    return x[0] if squeeze else x
