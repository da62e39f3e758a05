"""One-shape depthwise bench: XLA vs Pallas (f32 acc) vs Pallas (bf16 acc).

Usage: python -u scripts/dw_shape_bench.py H W C K [ops]
ops: comma list from {xla,pf32,pbf16}, default all.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.ops.depthwise_pallas import (
    _lax_reference, _pallas_forward)

B, N = 256, 30


def pallas_op(K, acc_dtype):
    # The production wrapper itself (cost_estimate, block specs and all) —
    # a local copy would silently de-sync from ops/depthwise_pallas.
    del K  # shape comes from the kernel array
    def call(x, k):
        return _pallas_forward(x, k, acc_dtype=acc_dtype)
    return call


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
    h, w, c, K = map(int, sys.argv[1:5])
    which = (sys.argv[5].split(",") if len(sys.argv) > 5
             else ["xla", "pf32", "pbf16"])
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, h, w, c) * 0.1, jnp.bfloat16)
    k = jnp.asarray(
        np.random.RandomState(1).randn(K, K, 1, c) * 0.1, jnp.bfloat16)
    ops = {"xla": lambda x, k: _lax_reference(x, k),
           "pf32": pallas_op(K, jnp.float32),
           "pbf16": pallas_op(K, jnp.bfloat16)}
    print(f"[{B},{h},{w},{c}] k{K}", flush=True)
    for label in which:
        run = chain(ops[label])
        timed(run, x, k, N)
        timed(run, x, k, 2 * N)
        t_n = min(timed(run, x, k, N) for _ in range(3))
        t_2n = min(timed(run, x, k, 2 * N) for _ in range(3))
        t = (t_2n - t_n) / N
        gbs = (2 * x.size * 2) / t / 1e9
        print(f"  {label:>6}: {t*1e3:7.3f} ms  {gbs:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
