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
batch). The config knobs keep the reference's ACTUAL tf.keras 2.9 semantics
(``config.yml:78-85``), including the surprising ones:

* ``ZOOM_RANGE`` — Keras RandomZoom factor: the output->input scale is
  uniform in ``[1 - z, 1 + z]`` (``> 1`` zooms OUT).
* ``WIDTH/HEIGHT_SHIFT_RANGE`` — shift fractions of the image dimensions.
* ``ROTATION_RANGE`` — Keras RandomRotation factor, a fraction **of 2π**:
  the reference's ``45`` means ±45 *full turns*, i.e. effectively a
  uniformly random rotation angle — NOT ±45°. Training-distribution parity
  requires replicating that. Quarter turns are peeled off as free rot90
  permutations so the residual rotation stays within ±45° and the matmul
  warp's ``a22`` bound (see :func:`_affine_resample_matmul`).
* ``BRIGHTNESS_RANGE`` — ``tf.image.stateless_random_brightness`` max_delta:
  an ABSOLUTE shift. On the reference's [0,255]-scale float images ±0.3
  gray levels is practically invisible; replicated faithfully rather than
  scaled up.
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
        rotation=float(aug_cfg.get("ROTATION_RANGE", 0.0)),
        brightness=float(aug_cfg.get("BRIGHTNESS_RANGE", 0.0)),
        horizontal_flip=bool(aug_cfg.get("HORIZONTAL_FLIP", False)),
    )


def _sample_thetas(key: jax.Array, batch: int, rotation: float) -> jax.Array:
    """Keras RandomRotation angles: uniform in ±``rotation``·2π
    (``rotation`` is a fraction of a full turn, tf.keras 2.9 semantics —
    the reference's 45 therefore means an effectively uniform angle)."""
    return jax.random.uniform(key, (batch,),
                              minval=-rotation * 2.0 * jnp.pi,
                              maxval=rotation * 2.0 * jnp.pi)


def _affine_from_parts(theta, zooms, tx, ty, flip, hw: Tuple[int, int]):
    """Inverse affine maps (output pixel -> input pixel) about the image
    center from per-image parts. Returns [B, 2, 3].

    The output->input scale is ``zooms`` directly (Keras RandomZoom:
    p_in = z·(p_out - c) + c, so z > 1 samples a larger source region =
    zoomed out)."""
    h, w = hw
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    a11 = cos * zooms * flip
    a12 = sin * zooms
    a21 = -sin * zooms * flip
    a22 = cos * zooms
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # p_in = A @ (p_out - c - t) + c
    b1 = cx - a11 * (cx + tx) - a12 * (cy + ty)
    b2 = cy - a21 * (cx + tx) - a22 * (cy + ty)
    return jnp.stack([jnp.stack([a11, a12, b1], -1),
                      jnp.stack([a21, a22, b2], -1)], axis=1)


def _sample_parts(key: jax.Array, batch: int, hw: Tuple[int, int], *,
                  zoom: float, shift_w: float, shift_h: float,
                  rotation: float, horizontal_flip: bool):
    h, w = hw
    kz, kr, ktx, kty, kf = jax.random.split(key, 5)
    zooms = 1.0 + jax.random.uniform(kz, (batch,), minval=-zoom, maxval=zoom)
    theta = _sample_thetas(kr, batch, rotation)
    tx = jax.random.uniform(ktx, (batch,), minval=-shift_w, maxval=shift_w) * w
    ty = jax.random.uniform(kty, (batch,), minval=-shift_h, maxval=shift_h) * h
    if horizontal_flip:
        flip = jnp.where(jax.random.bernoulli(kf, 0.5, (batch,)), -1.0, 1.0)
    else:
        flip = jnp.ones((batch,))
    return theta, zooms, tx, ty, flip


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


# Centered inverse-map matrices of jnp.rot90(img, m) composed to undo a
# quarter turn folded into the affine: _QPOW[j] is the 2x2 rotation matrix
# [[cos, sin], [-sin, cos]] at j*90 deg (the group the affine's rotation
# part lives in), so _QPOW[(-k) % 4] @ A(theta) == A(theta - k*90deg) up to
# the rot90 permutation of the source image.
_QPOW = jnp.asarray(
    [[[1.0, 0.0], [0.0, 1.0]],
     [[0.0, 1.0], [-1.0, 0.0]],
     [[-1.0, 0.0], [0.0, -1.0]],
     [[0.0, -1.0], [1.0, 0.0]]])


def _prerotate_batch(images: jax.Array, j: jax.Array) -> jax.Array:
    """rot90 each (square) image of [B, H, W, C] by its own j quarter
    turns. All four variants are computed as STATIC whole-batch permutes
    (transposes + reverses — cheap layout ops on TPU) and the per-image
    pick is an elementwise select chain. Measured equal in steady state
    to a vmapped ``lax.switch`` (~28.5 ms for the full augment program at
    [1024, 128, 128, 3]; a vectorized switch also computes every branch
    and selects), but this form doesn't depend on XLA's switch-under-vmap
    lowering staying gather-free."""
    r1 = jnp.rot90(images, 1, axes=(1, 2))
    r2 = jnp.rot90(images, 2, axes=(1, 2))
    r3 = jnp.rot90(images, 3, axes=(1, 2))
    jb = j.reshape(-1, 1, 1, 1)
    return jnp.where(jb == 0, images,
                     jnp.where(jb == 1, r1, jnp.where(jb == 2, r2, r3)))


def _warp_quarter_decomposed(images, theta, zooms, tx, ty, flip):
    """Warp square images by arbitrary-angle affines entirely on the MXU:
    the nearest quarter turn of each image's angle is peeled off as a free
    rot90 permutation of the source, and the residual (within ±45°, so the
    matmul warp's ``a22`` bound holds) runs through the two-pass tent-
    matmul resampler. Numerically equivalent to the 4-tap gather sampler
    with the full-angle affine (pinned in tests/test_augment.py)."""
    b, h, w, _ = images.shape
    k_quarter = jnp.round(theta / (jnp.pi / 2.0))
    j = jnp.mod(-k_quarter, 4.0).astype(jnp.int32)
    affines = _affine_from_parts(theta, zooms, tx, ty, flip, (h, w))
    # Fold the quarter turn out of the affine (left-multiply by the inverse
    # quarter rotation) and into a rot90 of the source image.
    q = _QPOW[j]                                   # [B, 2, 2]
    lin = jnp.einsum("bij,bjk->bik", q, affines[:, :, :2])
    cvec = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0])
    # b' = c - A' @ (c + t), same construction as _affine_from_parts.
    c_plus_t = cvec[None] + jnp.stack([tx, ty], axis=-1)
    boff = cvec[None] - jnp.einsum("bij,bj->bi", lin, c_plus_t)
    affines2 = jnp.concatenate([lin, boff[:, :, None]], axis=2)
    rotated = _prerotate_batch(images, j)
    return jax.vmap(_affine_resample_matmul)(rotated, affines2)


@partial(jax.jit, static_argnames=("zoom", "shift_w", "shift_h",
                                   "rotation", "brightness",
                                   "horizontal_flip"))
def augment_batch(images: jax.Array, key: jax.Array, *, zoom: float = 0.0,
                  shift_w: float = 0.0, shift_h: float = 0.0,
                  rotation: float = 0.0, brightness: float = 0.0,
                  horizontal_flip: bool = False) -> jax.Array:
    """Augment a [B, H, W, C] float batch in [0, 255]: fused affine
    (zoom+rotate+translate+flip, bilinear, zero fill) then brightness shift
    with clipping. One compiled program, resampled as matmuls on the MXU.

    ``rotation`` is the Keras RandomRotation factor (fraction of 2π; see
    the module docstring), ``brightness`` an absolute delta in gray levels.
    """
    images = images.astype(jnp.float32)
    b, h, w, _ = images.shape
    k_affine, k_bright = jax.random.split(key)
    theta, zooms, tx, ty, flip = _sample_parts(
        k_affine, b, (h, w), zoom=zoom, shift_w=shift_w, shift_h=shift_h,
        rotation=rotation, horizontal_flip=horizontal_flip)

    # The matmul warp needs a22 = cos(residual rotation) * zoom bounded
    # away from 0 (its pass-A slopes divide by a22) and materializes
    # O(H*W*max(H,W)) weights per image. Quarter-turn peeling keeps the
    # residual rotation within +-45 deg; the zoom factor (Keras semantics:
    # zooms in [1-z, 1+z] DIRECTLY scale a22) must keep min zoom >= 0.5 —
    # ZOOM_RANGE >= ~1 would drive a22 toward 0 and blow up the pass-A
    # sample positions (NaN at exactly 0). Outside these bounds — large
    # zoom ranges, non-square or large images — fall back to the 4-tap
    # gather sampler (slower but unrestricted).
    small_rot = rotation * 2.0 * jnp.pi <= jnp.pi / 4 + 1e-6
    use_matmul = (max(h, w) <= 160 and zoom <= 0.5
                  and (small_rot or h == w))
    if use_matmul and not small_rot:
        out = _warp_quarter_decomposed(images, theta, zooms, tx, ty, flip)
    else:
        affines = _affine_from_parts(theta, zooms, tx, ty, flip, (h, w))
        sampler = _affine_resample_matmul if use_matmul else _bilinear_sample
        out = jax.vmap(sampler)(images, affines)

    if brightness:
        # tf.image.stateless_random_brightness max_delta semantics: an
        # ABSOLUTE shift on the [0,255]-scale floats (reference
        # preprocessor.py:84-103) — NOT a fraction of full scale.
        delta = jax.random.uniform(k_bright, (b, 1, 1, 1),
                                   minval=-brightness, maxval=brightness)
        out = jnp.clip(out + delta, 0.0, 255.0)
    return out


def augment_from_config(images: jax.Array, key: jax.Array,
                        aug_cfg: Dict) -> jax.Array:
    return augment_batch(images, key, **affine_params_from_config(aug_cfg))
