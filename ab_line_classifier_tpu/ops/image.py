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


def antialias_sigma(src_hw: Tuple[int, int],
                    dst_hw: Tuple[int, int]) -> Tuple[float, float]:
    """skimage.transform.resize's default anti-aliasing sigma per axis:
    ``max(0, (downscale_factor - 1) / 2)`` (scikit-image 0.19.1, the
    reference's pin — reference ``requirements.txt:10``)."""
    return tuple(max(0.0, (s / d - 1.0) / 2.0)
                 for s, d in zip(src_hw, dst_hw))


def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d's kernel: radius
    ``int(truncate * sigma + 0.5)``, normalized Gaussian weights."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jax.Array, sigma_hw: Tuple[float, float],
                  truncate: float = 4.0) -> jax.Array:
    """Separable zero-padded Gaussian blur of ``[B, H, W]`` images, exactly
    ``scipy.ndimage.gaussian_filter(..., mode='grid-constant', cval=0)``
    (what skimage resize applies before its downsample; golden-tested
    against scipy in tests/test_etl.py). Zero padding falls out of the
    convolution's explicit padding — no host round-trip, and XLA fuses the
    two 1-D passes."""
    from jax import lax

    out = x[..., None].astype(jnp.float32)
    for axis, sigma in ((0, float(sigma_hw[0])), (1, float(sigma_hw[1]))):
        if sigma <= 0.0:
            continue
        k = _gaussian_kernel1d(sigma, truncate)
        r = (len(k) - 1) // 2
        shape = (len(k), 1) if axis == 0 else (1, len(k))
        kernel = jnp.asarray(k).reshape(shape + (1, 1))
        pad = [(r, r), (0, 0)] if axis == 0 else [(0, 0), (r, r)]
        out = lax.conv_general_dilated(
            out, kernel, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0]


def skimage_downsample(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """``skimage.transform.resize(..., mode='constant', preserve_range=True)``
    semantics (scikit-image 0.19.1) for ``[B, H, W]`` float images: Gaussian
    anti-aliasing at the default sigma, then half-pixel point-bilinear
    interpolation (``scipy.ndimage.zoom(order=1, grid_mode=True)``).
    Golden-tested against scipy.ndimage in tests/test_etl.py."""
    sigma = antialias_sigma(x.shape[1:], out_hw)
    if max(sigma) > 0.0:
        x = gaussian_blur(x, sigma)
    # antialias=False: jax's default triangle-kernel widening would
    # anti-alias a second time; skimage's bilinear sample is a point
    # interpolation after its Gaussian.
    return jax.image.resize(x, (x.shape[0],) + tuple(out_hw),
                            method="linear", antialias=False)


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
    x = nearest_resize(x, out_hw, resize_mode)
    if not np.array_equal(perm, np.arange(3)):
        x = x[..., jnp.asarray(perm)]

    x = x.astype(jnp.float32)
    x = x * jnp.asarray(scale) + jnp.asarray(bias)
    x = x.astype(out_dtype)
    # 3-D input -> 3-D output, matching nearest_resize and the Pallas path
    # (preprocess_pallas squeezes too) so single-frame callers get the same
    # rank on every backend.
    return x[0] if squeeze else x
