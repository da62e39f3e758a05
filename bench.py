#!/usr/bin/env python
"""Headline benchmark: cutoffvgg16 clip inference frames/sec on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

``vs_baseline`` is measured against the 20,000 frames/sec/chip north-star
(BASELINE.md; the reference publishes no numbers of its own).
"""

import json
import sys


def main() -> int:
    from ab_line_classifier_tpu.predict.benchmark import clip_inference_benchmark

    best = 0.0
    detail = {}
    for batch in (1024, 2048):
        try:
            r = clip_inference_benchmark(
                model_name="cutoffvgg16", batch_size=batch, verbose=False)
        except Exception as e:  # keep going; report best successful config
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            continue
        if r["frames_per_sec"] > best:
            best = r["frames_per_sec"]
            detail = r
    if best == 0.0:
        print(json.dumps({"metric": "cutoffvgg16_clip_inference",
                          "value": 0, "unit": "frames/sec",
                          "vs_baseline": 0.0, "error": "all configs failed"}))
        return 1
    print(json.dumps({
        "metric": "cutoffvgg16_clip_inference",
        "value": round(best, 1),
        "unit": "frames/sec",
        "vs_baseline": round(best / 20000.0, 4),
        "batch_size": detail.get("batch_size"),
        "ms_per_batch": round(detail.get("ms_per_batch", 0.0), 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
