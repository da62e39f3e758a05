"""Pallas depthwise-convolution kernel — measured, REJECTED, kept opt-in.

MobileNetV2 / Xception / EfficientNetB7 spend their serving time in
depthwise convolutions (reference ``src/models/models.py:51-100,153-245``
delegates them to Keras applications). Against a naive HBM roofline XLA's
grouped-conv lowering looks poor (~10-36% of ~819 GB/s on the zoo's
shapes), which motivated this kernel. The measurements said otherwise —
**the naive roofline is the wrong model**:

* A K×K depthwise conv does K²·2 FLOPs per 2-byte element — arithmetic
  intensity 9-25 FLOP/byte against the VPU:HBM machine balance of ~2.3
  (≈1.9 bf16 TFLOP/s VPU vs 819 GB/s HBM on v5e). Depthwise is
  **VPU-compute-bound**, not bandwidth-bound, for K ≥ 3.
* Against the correct VPU roofline, XLA's emitter already runs at 50-70%
  (and >100% of the VPU estimate on one Xception shape, i.e. it
  partially rides the MXU). Chained-scan timings, dispatch cancelled
  (scripts/depthwise_roofline.py, scripts/depthwise_pallas_bench.py).
* This kernel (shift-MAC on (W-sublane × C-lane) VMEM tiles, column-shift
  grouped so only K sublane relayouts happen) measures 0.5-1.0× XLA —
  ties on 5×5 shapes, loses on 3×3. The remaining headroom anywhere is
  ≤1.5-2×, on layers that are a minority of non-flagship serving time.

Verdict (docs/PERFORMANCE.md "Rejected optimizations"): XLA keeps the
depthwise path; this kernel stays as the measured artifact and an
``ABLC_DEPTHWISE=pallas`` opt-in for future backends/shapes, with parity
pinned by tests/test_depthwise_pallas.py.

Scope of the kernel itself: stride 1, ``SAME``, odd K ≤ 7, NHWC, bf16/f32
with f32 accumulation; everything else falls back to
``lax.conv_general_dilated``. Backward always runs the vjp of the XLA
reference (custom_vjp), so gradients are bit-identical either way.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Per-program input-block budget (bytes); frames-per-program is chosen so
# NB*H*W*LANES*itemsize stays under this (double-buffered by the pipeline).
_BLOCK_BUDGET = 1 << 20


def _lax_reference(x: jax.Array, k: jax.Array, stride: int = 1,
                   padding: str = "SAME") -> jax.Array:
    """XLA grouped-conv reference/fallback (identical call to graph.py's
    nn.Conv lowering)."""
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _kernel(x_ref, k_ref, o_ref, *, K: int, acc_dtype):
    # Loop order matters on the VPU: the last two dims (W, C) are the tiled
    # (sublane, lane) axes, so a W-offset slice is a sublane relayout (real
    # work) while an H-offset slice only re-addresses untiled leading tiles
    # (free). Grouping terms by dw shifts the tile K times instead of K*K.
    x = x_ref[...]                      # [NB, H, W, C_t]
    nb, h, w, _ = x.shape
    p = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    acc = None
    for dw in range(K):
        col = xp[:, :, dw:dw + w, :].astype(acc_dtype)   # one sublane shift
        for dh in range(K):
            term = (col[:, dh:dh + h, :, :]              # free row slice
                    * k_ref[dh, dw, 0, :].astype(acc_dtype))
            acc = term if acc is None else acc + term
    o_ref[...] = acc.astype(o_ref.dtype)


def _frames_per_block(h: int, w: int, itemsize: int) -> int:
    nb = max(1, _BLOCK_BUDGET // max(1, h * w * LANES * itemsize))
    return int(nb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_forward(x: jax.Array, k: jax.Array,
                    interpret: bool = False,
                    acc_dtype=jnp.float32) -> jax.Array:
    # acc_dtype is f32 in production (measured faster than bf16
    # accumulation — docs/PERFORMANCE.md); the parameter exists so
    # measurement scripts can bench the alternative through the EXACT
    # production wrapper instead of a drift-prone copy.
    b, h, w, c = x.shape
    K = k.shape[0]
    nb = _frames_per_block(h, w, x.dtype.itemsize)
    # Pad batch to a block multiple (dropped on exit) so the grid is exact.
    pad_b = (-b) % nb
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
    n_ct = pl.cdiv(c, LANES)
    grid = (x.shape[0] // nb, n_ct)
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, w, LANES), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K, 1, LANES), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, w, LANES), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.size * K * K,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, k)
    return out[:b] if pad_b else out


def _supported(x: jax.Array, k: jax.Array, stride: int,
               padding: str) -> bool:
    K, Kw = int(k.shape[0]), int(k.shape[1])
    return (stride == 1 and padding == "SAME" and K == Kw and K % 2 == 1
            and K <= 7 and x.ndim == 4 and k.shape[2] == 1
            and k.shape[3] == x.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv(x: jax.Array, k: jax.Array, stride: int = 1,
                   padding: str = "SAME") -> jax.Array:
    """Depthwise conv: Pallas kernel on TPU for stride-1 SAME odd-K, XLA
    grouped conv otherwise. ``k`` is ``[K, K, 1, C]`` (flax grouped-conv
    layout, as stored by graph.depthwise_conv2d)."""
    if _supported(x, k, stride, padding) and _use_pallas():
        return _pallas_forward(x, k)
    return _lax_reference(x, k, stride, padding)


def _use_pallas() -> bool:
    """Opt-in only: the kernel measured at 0.5-1.0x XLA's depthwise emitter
    on TPU v5e (module docstring), so the default is the XLA path
    everywhere. ``ABLC_DEPTHWISE=pallas`` flips supported layers onto the
    kernel (TPU only — the CPU interpreter is test-speed)."""
    import os

    return (os.environ.get("ABLC_DEPTHWISE", "xla") == "pallas"
            and jax.default_backend() == "tpu")


def _fwd(x, k, stride, padding):
    return depthwise_conv(x, k, stride, padding), (x, k)


def _bwd(stride, padding, res, g):
    x, k = res
    _, vjp = jax.vjp(lambda x_, k_: _lax_reference(x_, k_, stride, padding),
                     x, k)
    return vjp(g)


depthwise_conv.defvjp(_fwd, _bwd)


def depthwise_conv_interpret(x: jax.Array, k: jax.Array) -> jax.Array:
    """Interpreter-mode entry for CPU tests of the kernel itself."""
    return _pallas_forward(x, k, interpret=True)
