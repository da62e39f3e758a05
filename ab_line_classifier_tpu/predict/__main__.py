"""CLI entry point: ``python -m ab_line_classifier_tpu.predict``.

Mirrors ``python src/predict.py`` (reference ``src/predict.py:450-459``):
clip predictions with the configured algorithm/threshold, then frame
predictions at threshold 0.5.
"""

import argparse

from ab_line_classifier_tpu.config import load_config
from ab_line_classifier_tpu.predict.predict import (
    compute_clip_predictions, compute_frame_predictions)


def main():
    p = argparse.ArgumentParser(description="Frame + clip inference")
    p.add_argument("--config", default=None, help="path to config.yml")
    p.add_argument("--no-metrics", action="store_true",
                   help="skip metrics (no ground-truth column)")
    args = p.parse_args()

    cfg = load_config(args.config)
    frames_path = cfg["PATHS"]["FRAME_TABLE"]
    clips_path = cfg["PATHS"]["CLIPS_TABLE"]
    compute_clip_predictions(
        cfg, frames_path, clips_path,
        class_thresh=float(cfg["CLIP_PREDICTION"]["CLASSIFICATION_THRESHOLD"]),
        clip_algorithm=cfg["CLIP_PREDICTION"]["ALGORITHM"],
        calculate_metrics=not args.no_metrics)
    compute_frame_predictions(cfg, frames_path, class_thresh=0.5,
                              calculate_metrics=not args.no_metrics)


if __name__ == "__main__":
    main()
