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
    p.add_argument("--ext-val", action="store_true",
                   help="predict on the external-validation dataset "
                        "(PATHS.EXT_VAL_FRAME_TABLE / EXT_VAL_CLIPS_TABLE /"
                        " EXT_VAL_FRAMES — the reference documents these "
                        "keys but made users swap tables by hand, "
                        "reference README.md:168-170)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of both "
                        "inference passes to <PATHS.LOGS>/profiles")
    args = p.parse_args()

    cfg = load_config(args.config)
    if args.ext_val:
        needed = ("EXT_VAL_FRAME_TABLE", "EXT_VAL_CLIPS_TABLE",
                  "EXT_VAL_FRAMES")
        missing = [k for k in needed if not cfg["PATHS"].get(k)]
        if missing:
            raise SystemExit(
                f"--ext-val needs PATHS.{'/'.join(missing)} in the config "
                f"(external-validation tables, reference README.md:168-170)")
        frames_path = cfg["PATHS"]["EXT_VAL_FRAME_TABLE"]
        clips_path = cfg["PATHS"]["EXT_VAL_CLIPS_TABLE"]
        frames_dir = cfg["PATHS"]["EXT_VAL_FRAMES"]
    else:
        frames_path = cfg["PATHS"]["FRAME_TABLE"]
        clips_path = cfg["PATHS"]["CLIPS_TABLE"]
        frames_dir = cfg["PATHS"]["FRAMES"]

    def run():
        # One restore + one jit compile + ONE frame sweep shared by both
        # passes (each would otherwise reload the checkpoint, recompile —
        # minutes on a first TPU compile — and re-decode + re-predict the
        # full frame table; thresholds apply downstream of the probs, so
        # the sweep is pass-independent).
        import pandas as pd

        from ab_line_classifier_tpu.data.pipeline import FrameDataset
        from ab_line_classifier_tpu.predict.predict import default_predictor
        predictor = default_predictor(cfg)
        frames_df = pd.read_csv(frames_path)
        ds = FrameDataset(frames_df, frames_dir, img_dim=cfg.img_dim)
        frame_probs = predictor.predict_dataset(ds)
        compute_clip_predictions(
            cfg, frames_path, clips_path,
            class_thresh=float(
                cfg["CLIP_PREDICTION"]["CLASSIFICATION_THRESHOLD"]),
            clip_algorithm=cfg["CLIP_PREDICTION"]["ALGORITHM"],
            calculate_metrics=not args.no_metrics, predictor=predictor,
            frames_dir=frames_dir, frame_probs=frame_probs)
        compute_frame_predictions(cfg, frames_path, class_thresh=0.5,
                                  calculate_metrics=not args.no_metrics,
                                  predictor=predictor,
                                  frames_dir=frames_dir,
                                  frame_probs=frame_probs)

    from ab_line_classifier_tpu.utils.profiling import run_maybe_traced

    run_maybe_traced(run, args.profile, cfg)


if __name__ == "__main__":
    main()
