"""CLI entry point: ``python -m ab_line_classifier_tpu.export``.

Exports a trained checkpoint to a standard ONNX file — the outbound half of
the reference's deployment workflow (its WaveBase device serves ``.onnx``,
reference ``src/predict.py:39-51`` / ``src/deploy.py:36-68``; the reference
itself produces those files with an external keras->tf2onnx step this
command replaces).

    python -m ab_line_classifier_tpu.export \
        --model results/models/latest --out model.onnx --batch-size 1

Accepts any restorable checkpoint (Orbax dir, ``.h5``, or ``.onnx`` —
useful for re-stamping). The exported graph consumes preprocessed float32
``[batch, H, W, 3]`` input, matching the reference's ONNX serving contract.
"""

from __future__ import annotations

import argparse


def export_checkpoint(model_path: str, out_path: str, *,
                      batch_size: int = 1, cfg=None) -> None:
    from ab_line_classifier_tpu.models.onnx_export import export_onnx
    from ab_line_classifier_tpu.predict.predict import Predictor

    predictor = Predictor.restore(model_path, cfg=cfg)
    export_onnx(predictor.spec, predictor.variables, out_path,
                batch_size=batch_size)


def main() -> None:
    p = argparse.ArgumentParser(
        description="Export a trained checkpoint to ONNX")
    p.add_argument("--config", default=None, help="path to config.yml")
    p.add_argument("--model", default=None,
                   help="checkpoint path (default: PATHS.MODEL_TO_LOAD)")
    p.add_argument("--out", required=True, help="output .onnx path")
    p.add_argument("--batch-size", type=int, default=1,
                   help="static batch dim of the exported graph")
    args = p.parse_args()

    from ab_line_classifier_tpu.config import load_config

    cfg = load_config(args.config)
    model_path = args.model or cfg["PATHS"]["MODEL_TO_LOAD"]
    export_checkpoint(model_path, args.out, batch_size=args.batch_size,
                      cfg=cfg)
    print(f"exported {model_path} -> {args.out}")


if __name__ == "__main__":
    main()
