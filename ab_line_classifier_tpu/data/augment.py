"""Stateless, jit-compiled data augmentation.

The reference augments with a Keras Sequential of RandomZoom /
RandomTranslation / RandomRotation / RandomFlip / RandomBrightness applied
after batching on [0,255] float images (reference
``src/data/preprocessor.py:25-32,57``). Each Keras layer resamples the image
separately — five passes. Here the zoom, rotation, translation and flip
compose into a **single** inverse affine map applied with one bilinear
resample (fill value 0, like the reference's ``fill_mode='constant'``), plus
a brightness shift: one fused XLA program, one pass over the batch.

Randomness is explicit ``jax.random`` keys (the reference's RandomBrightness
quirk of a *fixed* seed (123,0) on every call — i.e. the same shift every
batch, preprocessor.py:102 — is not replicated; a fresh key is split per
batch). The config knobs keep their reference meanings (``config.yml:78-85``):
ZOOM_RANGE fraction, WIDTH/HEIGHT_SHIFT_RANGE fractions, ROTATION_RANGE in
degrees, BRIGHTNESS_RANGE as a fraction of full scale.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def affine_params_from_config(aug_cfg: Dict) -> Dict[str, float]:
    return dict(
        zoom=float(aug_cfg.get("ZOOM_RANGE", 0.0)),
        shift_w=float(aug_cfg.get("WIDTH_SHIFT_RANGE", 0.0)),
        shift_h=float(aug_cfg.get("HEIGHT_SHIFT_RANGE", 0.0)),
        rotation_deg=float(aug_cfg.get("ROTATION_RANGE", 0.0)),
        brightness=float(aug_cfg.get("BRIGHTNESS_RANGE", 0.0)),
        horizontal_flip=bool(aug_cfg.get("HORIZONTAL_FLIP", False)),
    )


def _sample_affines(key: jax.Array, batch: int, hw: Tuple[int, int], *,
                    zoom: float, shift_w: float, shift_h: float,
                    rotation_deg: float, horizontal_flip: bool):
    """Sample per-image inverse affine maps (output pixel -> input pixel),
    about the image center. Returns [B, 2, 3]."""
    h, w = hw
    kz, kr, ktx, kty, kf = jax.random.split(key, 5)
    zooms = 1.0 + jax.random.uniform(kz, (batch,), minval=-zoom, maxval=zoom)
    theta = jnp.deg2rad(jax.random.uniform(
        kr, (batch,), minval=-rotation_deg, maxval=rotation_deg))
    tx = jax.random.uniform(ktx, (batch,), minval=-shift_w, maxval=shift_w) * w
    ty = jax.random.uniform(kty, (batch,), minval=-shift_h, maxval=shift_h) * h
    if horizontal_flip:
        flip = jnp.where(jax.random.bernoulli(kf, 0.5, (batch,)), -1.0, 1.0)
    else:
        flip = jnp.ones((batch,))

    # Inverse map: rotate by -theta, scale by 1/zoom, undo translation.
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    inv_z = 1.0 / zooms
    a11 = cos * inv_z * flip
    a12 = sin * inv_z
    a21 = -sin * inv_z * flip
    a22 = cos * inv_z
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # p_in = A @ (p_out - c - t) + c
    b1 = cx - a11 * (cx + tx) - a12 * (cy + ty)
    b2 = cy - a21 * (cx + tx) - a22 * (cy + ty)
    return jnp.stack([jnp.stack([a11, a12, b1], -1),
                      jnp.stack([a21, a22, b2], -1)], axis=1)


def _bilinear_sample(img: jax.Array, affine: jax.Array) -> jax.Array:
    """Sample one HWC image through an inverse affine map, fill 0."""
    h, w, _ = img.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    x_in = affine[0, 0] * xs + affine[0, 1] * ys + affine[0, 2]
    y_in = affine[1, 0] * xs + affine[1, 1] * ys + affine[1, 2]

    x0 = jnp.floor(x_in)
    y0 = jnp.floor(y_in)
    wx = x_in - x0
    wy = y_in - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # [H, W, C] gather
        return vals * valid[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _tent(coords: jax.Array, n: int) -> jax.Array:
    """Bilinear-with-zero-fill sampling weights as a tent function:
    weight(pixel i) = max(0, 1 - |coord - i|). Exactly equivalent to the
    two-tap bilinear interpolation with out-of-range taps contributing 0."""
    grid = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))


def _affine_resample_matmul(img: jax.Array, affine: jax.Array) -> jax.Array:
    """Inverse-affine bilinear resample as TWO banded matmuls (the
    Catmull–Smith two-pass warp): an x-resample whose per-row sample
    positions are affine in (x, y), then a y-resample per column. The
    sampling weights are tent functions contracted on the MXU — the same
    'resampling is matmul' idiom as the Pallas preprocess kernel — instead
    of per-pixel gathers, which are pathologically slow on TPU (measured
    ~75x slower per epoch).

    Requires a22 != 0 (true for the config's ranges: |rotation| <= 45 deg,
    zoom within ~2x)."""
    h, w, _ = img.shape
    a11, a12, b1 = affine[0, 0], affine[0, 1], affine[0, 2]
    a21, a22, b2 = affine[1, 0], affine[1, 1], affine[1, 2]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)

    # Pass A resamples along x producing tmp[y, x] = in(u(x, y), y) with
    # u chosen so that composing with pass B reproduces the full map:
    # u(x, v) = (a11 - a12 a21/a22) x + (a12/a22) v + (b1 - a12 b2/a22).
    alpha = a11 - a12 * a21 / a22
    beta = a12 / a22
    gamma = b1 - a12 * b2 / a22
    x_in = alpha * xs[None, :] + beta * ys[:, None] + gamma    # [H, Wout]
    wx = _tent(x_in, w)                                        # [H, Wout, Win]
    tmp = jnp.einsum("yxw,ywc->yxc", wx, img)

    # Pass B resamples along y: out[y, x] = tmp(y_in(y, x), x).
    y_in = a21 * xs[None, :] + a22 * ys[:, None] + b2          # [Hout, W]
    wy = _tent(y_in, h)                                        # [Hout, W, Hin]
    return jnp.einsum("yxv,vxc->yxc", wy, tmp)


@partial(jax.jit, static_argnames=("zoom", "shift_w", "shift_h",
                                   "rotation_deg", "brightness",
                                   "horizontal_flip"))
def augment_batch(images: jax.Array, key: jax.Array, *, zoom: float = 0.0,
                  shift_w: float = 0.0, shift_h: float = 0.0,
                  rotation_deg: float = 0.0, brightness: float = 0.0,
                  horizontal_flip: bool = False) -> jax.Array:
    """Augment a [B, H, W, C] float batch in [0, 255]: fused affine
    (zoom+rotate+translate+flip, bilinear, zero fill) then brightness shift
    with clipping. One compiled program, resampled as matmuls on the MXU."""
    images = images.astype(jnp.float32)
    b, h, w, _ = images.shape
    k_affine, k_bright = jax.random.split(key)
    affines = _sample_affines(k_affine, b, (h, w), zoom=zoom, shift_w=shift_w,
                              shift_h=shift_h, rotation_deg=rotation_deg,
                              horizontal_flip=horizontal_flip)
    # The matmul warp needs a22 bounded away from 0 (rotations < ~60 deg)
    # and materializes O(H*W*max(H,W)) weights per image — outside those
    # bounds fall back to the 4-tap gather sampler (slower but unrestricted).
    use_matmul = (rotation_deg < 60.0) and (max(h, w) <= 160)
    sampler = _affine_resample_matmul if use_matmul else _bilinear_sample
    out = jax.vmap(sampler)(images, affines)
    if brightness:
        delta = jax.random.uniform(k_bright, (b, 1, 1, 1),
                                   minval=-brightness, maxval=brightness) * 255.0
        out = jnp.clip(out + delta, 0.0, 255.0)
    return out


def augment_from_config(images: jax.Array, key: jax.Array,
                        aug_cfg: Dict) -> jax.Array:
    return augment_batch(images, key, **affine_params_from_config(aug_cfg))
