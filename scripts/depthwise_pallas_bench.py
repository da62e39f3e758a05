"""Pallas vs XLA depthwise conv on the real TPU (chained timing).

Same methodology as depthwise_roofline.py: dependency-chained lax.scan,
marginal per-op time from two scan lengths.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.ops.depthwise_pallas import (_lax_reference,
                                                         _pallas_forward)

HBM_PEAK_GBS = 819.0
SHAPES = [
    ("mbv2_b0_96", 64, 64, 96, 3),
    ("mbv2_192", 16, 16, 192, 3),
    ("xcep_728", 16, 16, 728, 3),
    ("effb7_288", 32, 32, 288, 3),
    ("effb7_480k5", 16, 16, 480, 5),
    ("effb7_960", 16, 16, 960, 3),
]
B = 256
N = 50


def chain(op):
    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x, k, n):
        def body(c, _):
            return op(c, k), ()
        y, _ = jax.lax.scan(body, x, (), length=n)
        return y
    return run


def timed(run, x, k, n):
    y = run(x, k, n)
    np.asarray(y[0, 0, 0, 0])
    t0 = time.perf_counter()
    y = run(x, k, n)
    np.asarray(y[0, 0, 0, 0])
    return time.perf_counter() - t0


def main():
    print(f"devices: {jax.devices()}")
    for name, h, w, c, K in SHAPES:
        x = jnp.asarray(
            np.random.RandomState(0).randn(B, h, w, c) * 0.1, jnp.bfloat16)
        k = jnp.asarray(
            np.random.RandomState(1).randn(K, K, 1, c) * 0.1, jnp.bfloat16)
        row = f"{name:>12} [{B},{h},{w},{c}]k{K}:"
        for label, op in [("xla", _lax_reference),
                          ("pallas", lambda x, k: _pallas_forward(x, k))]:
            run = chain(op)
            timed(run, x, k, N)
            timed(run, x, k, 2 * N)
            t_n = min(timed(run, x, k, N) for _ in range(3))
            t_2n = min(timed(run, x, k, 2 * N) for _ in range(3))
            t = (t_2n - t_n) / N
            gbs = (2 * x.size * 2 + k.size * 2) / t / 1e9
            row += (f"  {label} {t*1e3:7.3f} ms "
                    f"({gbs:6.1f} GB/s, {100*gbs/HBM_PEAK_GBS:5.1f}%)")
        print(row, flush=True)


if __name__ == "__main__":
    main()
