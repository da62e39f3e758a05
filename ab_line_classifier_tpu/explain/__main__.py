"""CLI entry point: ``python -m ab_line_classifier_tpu.explain``.

Mirrors ``python src/explainability/gradcam.py`` (reference
``gradcam.py:115-118``) headlessly: the reference pops a tkinter file dialog
per frame; here frames are named on the command line (or every frame of the
frame table is explained).
"""

import argparse

import pandas as pd

from ab_line_classifier_tpu.config import load_config
from ab_line_classifier_tpu.explain.gradcam import GradCAMExplainer


def main():
    p = argparse.ArgumentParser(description="Grad-CAM heatmaps")
    p.add_argument("--config", default=None, help="path to config.yml")
    p.add_argument("--frames", nargs="*", default=None,
                   help="frame filenames to explain (default: first 8 of "
                        "the frame table)")
    p.add_argument("--mode", choices=["normal", "plusplus"], default=None)
    p.add_argument("--limit", type=int, default=8)
    args = p.parse_args()

    cfg = load_config(args.config)
    explainer = GradCAMExplainer(cfg, mode=args.mode)
    frame_df = pd.read_csv(cfg["PATHS"]["FRAME_TABLE"])
    if args.frames:
        frame_df = frame_df[frame_df["Frame Path"].isin(args.frames)]
    else:
        frame_df = frame_df.head(args.limit)
    frame_df = frame_df.reset_index(drop=True)
    explainer.apply_gradcam(frame_df)
    print(f"wrote {len(frame_df)} heatmaps to {cfg['PATHS']['HEATMAPS']}")


if __name__ == "__main__":
    main()
