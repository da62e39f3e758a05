"""Depthwise-conv roofline microbenchmark (real TPU).

The model-zoo serving table (docs/PERFORMANCE.md) shows the depthwise
architectures far below MXU MFU — expected, since a KxK depthwise conv
does only K*K FLOPs per loaded element (VPU work, HBM-bandwidth-bound).
The open question this script answers: is XLA's depthwise lowering at the
HBM roofline (nothing to gain), or is there headroom a Pallas kernel could
claim?

Methodology: sub-millisecond ops cannot be timed with one dispatch per
iteration on this tunneled backend (dispatch overhead dominates; the
n-vs-2n skew check exposes it). Each measurement is a dependency-chained
``lax.scan`` of the op on device — stride-1 depthwise is shape-preserving,
so the output feeds the next iteration directly — timed at two scan
lengths, reporting the marginal per-iteration time (2n time - n time) / n,
which cancels dispatch and scan-setup cost.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK_GBS = 819.0  # TPU v5e

# (name, H, W, C) — representative stride-1 depthwise layers at batch B.
SHAPES = [
    ("mbv2_b0_96", 64, 64, 96),
    ("mbv2_192", 16, 16, 192),
    ("mbv2_384", 8, 8, 384),
    ("mbv2_576", 8, 8, 576),
    ("xcep_728", 16, 16, 728),
    ("effb7_288", 32, 32, 288),
    ("effb7_960", 16, 16, 960),
]
B = 256
K = 3
N_ITERS = 50


@functools.partial(jax.jit, static_argnums=(2,))
def chained(x, k, n):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c.shape[-1])
        return y, ()

    y, _ = jax.lax.scan(body, x, (), length=n)
    return y


def timed(x, k, n):
    y = chained(x, k, n)
    np.asarray(y[0, 0, 0, 0])
    t0 = time.perf_counter()
    y = chained(x, k, n)
    np.asarray(y[0, 0, 0, 0])
    return time.perf_counter() - t0


def bench_one(name, h, w, c):
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, h, w, c) * 0.1, jnp.bfloat16)
    k = jnp.asarray(
        np.random.RandomState(1).randn(K, K, 1, c) * 0.1, jnp.bfloat16)
    timed(x, k, N_ITERS)  # warm both executables
    timed(x, k, 2 * N_ITERS)
    t_n = min(timed(x, k, N_ITERS) for _ in range(3))
    t_2n = min(timed(x, k, 2 * N_ITERS) for _ in range(3))
    t = (t_2n - t_n) / N_ITERS  # marginal per-op time, dispatch cancelled
    bytes_moved = (B * h * w * c * 2) * 2 + K * K * c * 2  # in + out + w
    flops = B * h * w * c * K * K * 2
    gbs = bytes_moved / t / 1e9
    print(f"{name:>11} [{B},{h},{w},{c}]: {t*1e3:7.3f} ms/op  "
          f"{gbs:7.1f} GB/s ({100*gbs/HBM_PEAK_GBS:5.1f}% roofline)  "
          f"{flops/t/1e12:6.2f} TFLOP/s", flush=True)
    return t, gbs


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for s in SHAPES:
        bench_one(*s)


if __name__ == "__main__":
    main()
