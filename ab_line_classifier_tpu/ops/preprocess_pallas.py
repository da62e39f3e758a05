"""Fused Pallas preprocessing kernel: frame -> model input in one device pass.

The reference's image hot path is a chain of tf.data map stages — decode,
resize (nearest), one-hot, batch, scale (reference
``src/data/preprocessor.py:36-80``) — running on host CPU threads. Here the
post-decode chain runs on the TPU as ONE Pallas kernel per image:

    uint8 HWC frame --Rsel@--> row-resized --@Csel--> col-resized+channel-
    permuted --*scale*mask+bias--> model-ready bf16/f32

The TPU-native trick: nearest-neighbor resize is a *gather with static
indices*, and a static gather along an axis is exactly a multiplication by a
0/1 selection matrix — MXU work instead of unsupported vector gathers.

* ``Rsel [H_out, H_src]``: one-hot rows picking source rows.
* ``Csel [W_src*3, W_out*3]``: one-hot columns picking source columns on the
  width*channel-flattened axis — which also absorbs the caffe BGR channel
  swap for free (the column map permutes channels within each output pixel).

Selection matmuls accumulate exactly one product per output element, so
bf16 inputs with f32 accumulation are *bit-exact* (uint8 values are exact in
bf16). The channelwise normalization (scale/bias) and the ultrasound beam
mask multiply run as the kernel epilogue, so the whole path is one HBM
read + one HBM write per frame.

FLOP cost at 480x640 -> 128x128: ~0.4 GFLOP/frame, microseconds on the MXU —
resize rides compute units that would otherwise idle during input handling.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ab_line_classifier_tpu.models.preprocess import preprocess_affine_params
from ab_line_classifier_tpu.ops.image import fused_preprocess, nearest_indices


@functools.lru_cache(maxsize=32)
def _selection_mats(src_hw: Tuple[int, int], dst_hw: Tuple[int, int],
                    resize_mode: str, perm: Tuple[int, int, int]):
    """Precompute the 0/1 selection matrices (host-side, cached)."""
    hs, ws = src_hw
    hd, wd = dst_hw
    ridx = nearest_indices(hs, hd, resize_mode)
    cidx = nearest_indices(ws, wd, resize_mode)

    rsel = np.zeros((hd, hs), dtype=np.float32)
    rsel[np.arange(hd), ridx] = 1.0

    # Flattened width*channel column map, folding the channel permutation in:
    # output column j = w*3 + c reads source column cidx[w]*3 + perm[c].
    csel = np.zeros((ws * 3, wd * 3), dtype=np.float32)
    j = np.arange(wd * 3)
    src_cols = cidx[j // 3] * 3 + np.asarray(perm)[j % 3]
    csel[src_cols, j] = 1.0
    return rsel, csel


def _preprocess_kernel(img_ref, rsel_ref, csel_ref, scale_ref, bias_ref,
                       mask_ref, out_ref):
    """One grid step = one frame. img [1, H_src, W_src*3] uint8."""
    # Mosaic has no direct uint8->float cast; hop u8 -> i32 -> f32 -> bf16
    # (exact for 0..255).
    img = img_ref[0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    rsel = rsel_ref[:]                              # [H_out, H_src] bf16
    csel = csel_ref[:]                              # [W_src*3, W_out*3] bf16
    rows = jnp.dot(rsel, img, preferred_element_type=jnp.float32)
    resized = jnp.dot(rows.astype(jnp.bfloat16), csel,
                      preferred_element_type=jnp.float32)
    out = resized * scale_ref[:] * mask_ref[:] + bias_ref[:]
    out_ref[0] = out.astype(out_ref.dtype)


def pallas_preprocess(frames: jax.Array, *,
                      out_hw: Tuple[int, int] = (128, 128),
                      preprocess_mode: str = "scale",
                      resize_mode: str = "tf",
                      mask: Optional[jax.Array] = None,
                      out_dtype=jnp.float32,
                      blank_ui_region: bool = False,
                      interpret: bool = False) -> jax.Array:
    """Pallas-fused equivalent of :func:`ops.image.fused_preprocess`.

    :param frames: uint8 ``[B, H, W, 3]`` (or ``[H, W, 3]``) RGB frames.
    :param mask: optional ``[H, W]`` beam mask applied at source resolution
        (resized with the same index map, multiplied pre-normalization so
        masked pixels equal ``preprocess(0)`` exactly like pre-masked clips).
    """
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[None]
    b, hs, ws, c = frames.shape
    assert c == 3, "expected RGB frames"
    hd, wd = out_hw

    if blank_ui_region:
        h = min(50, hs)
        w = min(160, ws)
        region = np.ones((hs, ws), dtype=np.float32)
        region[:h, :w] = 0.0
        mask = region if mask is None else np.asarray(mask, np.float32) * region

    perm, scale, bias = preprocess_affine_params(preprocess_mode)
    rsel, csel = _selection_mats((hs, ws), (hd, wd), resize_mode, tuple(perm))

    # Channelwise scale/bias tiled over the flattened width*channel axis.
    scale_row = np.tile(scale, wd).reshape(1, wd * 3).astype(np.float32)
    bias_row = np.tile(bias, wd).reshape(1, wd * 3).astype(np.float32)

    if mask is not None:
        m = np.asarray(mask, dtype=np.float32)
        ridx = nearest_indices(hs, hd, resize_mode)
        cidx = nearest_indices(ws, wd, resize_mode)
        m_resized = m[ridx][:, cidx]                      # [H_out, W_out]
        mask3 = np.repeat(m_resized, 3, axis=1)           # [H_out, W_out*3]
    else:
        mask3 = np.ones((hd, wd * 3), dtype=np.float32)

    img_flat = frames.reshape(b, hs, ws * 3)

    out = pl.pallas_call(
        _preprocess_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hs, ws * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws * 3, wd * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, wd * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hd, wd * 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hd, wd * 3), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (hd * hs * ws * 3 + hd * ws * 3 * wd * 3),
            bytes_accessed=b * (hs * ws * 3 + hd * wd * 3 * 4),
            transcendentals=0,
        ),
    )(
        img_flat,
        jnp.asarray(rsel, jnp.bfloat16),
        jnp.asarray(csel, jnp.bfloat16),
        jnp.asarray(scale_row),
        jnp.asarray(bias_row),
        jnp.asarray(mask3),
    )
    out = out.reshape(b, hd, wd, 3)
    return out[0] if squeeze else out


# Empirically calibrated on TPU v5e (2026-08, this jaxlib/Mosaic): one grid
# step holds the whole source frame in VMEM, and Mosaic compilation fails
# past ~5M source elements. Measured: 1080x1440x3 = 4.67M compiles and runs,
# 1200x1600x3 = 5.76M fails remote compile. 4.7M admits every verified size.
_MAX_SRC_ELEMENTS = 4_700_000


def pallas_fits_vmem(src_hw: Tuple[int, int],
                     out_hw: Tuple[int, int] = (128, 128)) -> bool:
    """Whether one grid step of :func:`pallas_preprocess` fits VMEM.

    The kernel holds the whole source frame as ONE VMEM block, so large
    frames (e.g. raw 1080p/1200p mp4 through the WaveBase deploy path)
    exceed the ~16 MB VMEM and fail Mosaic compilation; the auto path must
    fall back to the fused-XLA program, which tiles freely. The budget is
    empirical (see ``_MAX_SRC_ELEMENTS``), calibrated at 128x128 output;
    larger outputs also grow the column-selection matrix and the row-pass
    intermediate, so they proportionally shrink the admitted source size.
    """
    hs, ws = src_hw
    hd, wd = out_hw
    scale = max(1.0, (hd * wd) / (128 * 128))
    return hs * ws * 3 * scale <= _MAX_SRC_ELEMENTS


def preprocess_frames(frames: jax.Array, *, use_pallas: Optional[bool] = None,
                      **kwargs) -> jax.Array:
    """Auto-selecting entry point: the Pallas kernel on TPU (when the
    source size fits VMEM), the fused-XLA path elsewhere (CPU tests run
    the same math through XLA)."""
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and pallas_fits_vmem(frames.shape[-3:-1],
                                           kwargs.get("out_hw", (128, 128))))
    if use_pallas:
        return pallas_preprocess(frames, **kwargs)
    # Pallas-only debug knob: meaningless for the XLA path, dropped so the
    # same call works on every backend.
    kwargs.pop("interpret", None)
    mask = kwargs.pop("mask", None)
    if mask is not None:
        mask = jnp.asarray(mask)
    return fused_preprocess(frames, mask=mask, **kwargs)
