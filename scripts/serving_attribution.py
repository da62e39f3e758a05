#!/usr/bin/env python
"""Zoo-model serving attribution on the real chip (default: EfficientNetB7).

The zoo table's slowest row (efficientnetb7, reference models.py:198-245)
needed the same accountability as the flagship: a batch sweep plus a
per-stage time/FLOP attribution saying WHERE the MFU goes, against the
correct per-unit roofline (depthwise = VPU-bound at ~2.3 FLOP/byte
machine balance, docs/PERFORMANCE.md). The method lives in
``predict/attribution.py`` (graph cut + boundary overrides, chained-scan
L-vs-2L differenced timing — correctness pinned by
``tests/test_attribution.py``); this script drives it for any zoo model.

Usage (real TPU, one process at a time):
    python -u scripts/serving_attribution.py [--model efficientnetb7] \
        [--batch 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="efficientnetb7")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sweep", nargs="*", type=int,
                    default=[512, 1024, 2048])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    # Probe the tunnel before touching the backend (CLAUDE.md: jax.devices()
    # has blocked forever on a wedged axon tunnel) — reuse bench.py's
    # bounded probe so a dead tunnel yields an error line, not a hang.
    import bench as _bench

    probe_err = _bench._backend_error(
        float(os.environ.get("ABLC_BENCH_PROBE_TIMEOUT", "900")))
    if probe_err:
        print(json.dumps({"model": args.model, "error": probe_err}),
              flush=True)
        return 1

    import jax

    from ab_line_classifier_tpu.predict.benchmark import (
        _build_flagship, clip_inference_benchmark)

    spec = _build_flagship(args.model, (128, 128))

    print(f"devices: {jax.devices()}", flush=True)

    # ------------------------------------------------------------------
    # 1. Batch sweep (end-to-end serving, the production program)
    # ------------------------------------------------------------------
    sweep = {}
    for b in args.sweep:
        try:
            t0 = time.time()
            r = clip_inference_benchmark(model_name=args.model, spec=spec,
                                         batch_size=b, verbose=False)
            sweep[b] = r
            print(f"[sweep] batch {b}: {r['frames_per_sec']:.0f} f/s "
                  f"({r['ms_per_batch']:.1f} ms/batch; wall "
                  f"{time.time()-t0:.0f}s incl. compile)", flush=True)
        except Exception as e:
            print(f"[sweep] batch {b} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # ------------------------------------------------------------------
    # 2. Per-stage attribution at --batch (predict/attribution.py; the
    #    stem gets its own row ahead of the auto-detected block stages)
    # ------------------------------------------------------------------
    from ab_line_classifier_tpu.predict.attribution import (
        attribute_stages, auto_boundaries)

    boundaries = auto_boundaries(spec.graph)
    if "stem_activation" in spec.graph.layer_names:
        boundaries = [("stem", "stem_activation")] + boundaries
    rows = attribute_stages(spec, batch=args.batch, boundaries=boundaries,
                            iters=args.iters)

    total_ms = sum(r["ms"] for r in rows)
    best_batch = max(sweep, key=lambda b: sweep[b]["frames_per_sec"]) \
        if sweep else None
    print(json.dumps({
        "model": args.model, "batch": args.batch,
        "sweep": {str(b): {"frames_per_sec": round(r["frames_per_sec"], 1),
                           "ms_per_batch": round(r["ms_per_batch"], 2)}
                  for b, r in sweep.items()},
        "best_batch": best_batch,
        "stage_total_ms": round(total_ms, 2),
        "stages": rows,
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
