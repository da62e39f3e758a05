#!/usr/bin/env python
"""EfficientNetB7 serving attribution on the real chip.

The zoo table's slowest row (efficientnetb7, reference models.py:198-245)
needs the same accountability as the flagship: a batch sweep plus a
per-stage time/FLOP attribution that says WHERE the 14% MFU goes, against
the correct per-unit roofline (depthwise = VPU-bound at ~2.3 FLOP/byte
machine balance, docs/PERFORMANCE.md rejected-levers).

Per-stage method: the graph IR's ``cut`` + ``overrides`` machinery
compiles one program per stage segment — ``cut(boundary_i)`` truncates the
graph at stage i's output and ``overrides={boundary_{i-1}: x}`` replaces
the upstream computation with a fed activation, which XLA then dead-code
eliminates. Each segment is the exact serving computation of that stage,
measured with the same n-vs-2n timing discipline as predict/benchmark.py.

Usage (real TPU, one process at a time):
    python -u scripts/b7_serving_attribution.py [--batch 512]
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sweep", nargs="*", type=int,
                    default=[512, 1024, 2048])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ab_line_classifier_tpu.graph import GraphModule
    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.predict.benchmark import (
        clip_inference_benchmark)

    # config.yml's B7 hparams (HPARAMS.EFFICIENTNETB7; the reference's
    # defaults, models.py:198-245)
    hp = {"LR": 0.1, "DROPOUT": 0.5, "L2_LAMBDA": 0.01, "FREEZE_IDX": -1,
          "NODES_DENSE0": 32}
    spec = build_model("efficientnetb7", hp, (128, 128, 3), 2)

    print(f"devices: {jax.devices()}", flush=True)

    # ------------------------------------------------------------------
    # 1. Batch sweep (end-to-end serving, the production program)
    # ------------------------------------------------------------------
    sweep = {}
    for b in args.sweep:
        try:
            t0 = time.time()
            r = clip_inference_benchmark(model_name="efficientnetb7",
                                         spec=spec,
                                         batch_size=b, verbose=False)
            sweep[b] = r
            print(f"[sweep] batch {b}: {r['frames_per_sec']:.0f} f/s "
                  f"({r['ms_per_batch']:.1f} ms/batch; wall "
                  f"{time.time()-t0:.0f}s incl. compile)", flush=True)
        except Exception as e:
            print(f"[sweep] batch {b} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # ------------------------------------------------------------------
    # 2. Per-stage attribution at --batch
    # ------------------------------------------------------------------
    variables = spec.init_variables(jax.random.PRNGKey(0))
    bf16_vars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32 else a,
        variables)

    names = spec.graph.layer_names
    boundaries = [("stem", "stem_activation")]
    for stage in range(1, 8):
        stage_names = [n for n in names
                       if re.match(rf"block{stage}[a-z]", n)]
        boundaries.append((f"block{stage}", stage_names[-1]))
    boundaries.append(("top+head", spec.graph.output))

    # activation shapes at every boundary, from ONE traced eval_shape
    cap = tuple(b for _, b in boundaries[:-1])
    mod_cap = spec.module(capture=cap)
    x0 = jnp.zeros((args.batch, 128, 128, 3), jnp.bfloat16)
    _, cap_shapes = jax.eval_shape(
        lambda v, x: mod_cap.apply(v, x, train=False), bf16_vars, x0)
    rng = np.random.RandomState(0)

    L = args.iters

    def chain_seconds(chained_jit, feed):
        """Wall seconds for ONE dispatched chain (tiny ys output — no big
        transfers), min over 3 repeats after a warmup."""
        np.asarray(chained_jit(bf16_vars, feed))  # warm + materialize
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained_jit(bf16_vars, feed))
            best = min(best, time.perf_counter() - t0)
        return best

    def timed(seg_body, feed, null_body):
        """Per-iteration device seconds for seg_body.

        The tunnel's per-dispatch and transfer overheads swamp direct
        loops (a first cut measured a 711 ms 'stem' against a 64 ms full
        model), so: run the segment inside a dependency-CHAINED lax.scan
        (the single_frame_latency_benchmark recipe — a runtime-zero bump
        keeps iterations serial and un-hoistable), time chains of length
        L and 2L, and difference them — fixed dispatch cost cancels
        exactly. A 'null' chain (same carry update, no segment) is
        differenced the same way and subtracted, removing the carry-add
        overhead (which scales with the boundary activation size).
        """
        def make(body_fn, length):
            def chained(v, a):
                def body(x, _):
                    out = body_fn(v, x)
                    o0 = out.ravel()[0]
                    bump = (o0 * 1e-30).astype(a.dtype)
                    return x + bump, o0
                _, ys = jax.lax.scan(body, a, None, length=length)
                return ys
            return jax.jit(chained)
        t_seg = (chain_seconds(make(seg_body, 2 * L), feed)
                 - chain_seconds(make(seg_body, L), feed)) / L
        t_null = (chain_seconds(make(null_body, 2 * L), feed)
                  - chain_seconds(make(null_body, L), feed)) / L
        return max(t_seg - t_null, 1e-9), t_seg, t_null

    rows = []
    prev_boundary = None
    for stage_name, boundary in boundaries:
        g = (spec.graph if boundary == spec.graph.output
             else spec.graph.cut(boundary))
        mod = GraphModule(graph=g)
        if prev_boundary is None:
            feed = x0
        else:
            shp = cap_shapes[prev_boundary]
            feed = jnp.asarray(
                rng.standard_normal(shp.shape) * 0.1, jnp.bfloat16)

        def seg(v, a, _prev=prev_boundary, _mod=mod):
            if _prev is None:
                return _mod.apply(v, a, train=False)
            # x0 only anchors the (dead) input node; the override feeds
            # the real segment input and XLA DCEs everything upstream.
            return _mod.apply(v, x0, train=False, overrides={_prev: a})

        def null(v, a):
            return a.ravel()[:1]

        t0 = time.time()
        cost = jax.jit(seg).lower(bf16_vars, feed).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, list) else (cost or {})
        t_iter, t_seg, t_null = timed(seg, feed, null)
        spread = t_null / max(t_seg, 1e-12)  # carry-overhead share removed
        flops = float(cost.get("flops", 0.0))
        hbm = float(cost.get("bytes accessed", 0.0))
        rows.append({
            "stage": stage_name, "boundary": boundary,
            "ms": round(t_iter * 1e3, 3),
            "chain_overhead_share": round(spread, 3),
            "gflops": round(flops / 1e9, 2),
            "tflops_per_sec": round(flops / t_iter / 1e12, 2),
            "gb_accessed": round(hbm / 1e9, 3),
            "gb_per_sec": round(hbm / t_iter / 1e9, 1),
            "flops_per_byte": round(flops / hbm, 2) if hbm else None,
            "wall_s": round(time.time() - t0, 1),
        })
        print(f"[stage] {json.dumps(rows[-1])}", flush=True)
        prev_boundary = boundary if boundary != spec.graph.output else None

    total_ms = sum(r["ms"] for r in rows)
    best_batch = max(sweep, key=lambda b: sweep[b]["frames_per_sec"]) \
        if sweep else None
    print(json.dumps({
        "model": "efficientnetb7", "batch": args.batch,
        "sweep": {str(b): {"frames_per_sec": round(r["frames_per_sec"], 1),
                           "ms_per_batch": round(r["ms_per_batch"], 2)}
                  for b, r in sweep.items()},
        "best_batch": best_batch,
        "stage_total_ms": round(total_ms, 2),
        "stages": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
