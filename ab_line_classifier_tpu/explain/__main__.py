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
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the "
                        "explain pass to <PATHS.LOGS>/profiles")
    args = p.parse_args()

    cfg = load_config(args.config)
    frame_df = pd.read_csv(cfg["PATHS"]["FRAME_TABLE"])
    if args.frames:
        # The table stores bare filenames; accept full/relative paths too
        # (users tab-complete paths) by matching on basename, like
        # GradCAMExplainer.get_heatmap_for_frame.
        import os

        wanted = {os.path.basename(f) for f in args.frames}
        table_names = frame_df["Frame Path"].map(os.path.basename)
        frame_df = frame_df[table_names.isin(wanted)]
        if frame_df.empty:
            raise SystemExit(
                f"none of {sorted(wanted)} found in the frame table "
                f"({cfg['PATHS']['FRAME_TABLE']})")
    else:
        frame_df = frame_df.head(args.limit)
    frame_df = frame_df.reset_index(drop=True)

    def run():
        explainer = GradCAMExplainer(cfg, mode=args.mode)
        explainer.apply_gradcam(frame_df)

    from ab_line_classifier_tpu.utils.profiling import run_maybe_traced

    run_maybe_traced(run, args.profile, cfg)
    print(f"wrote {len(frame_df)} heatmaps to {cfg['PATHS']['HEATMAPS']}")


if __name__ == "__main__":
    main()
