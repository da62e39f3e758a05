"""End-to-end quickstart on a generated synthetic dataset — no real data,
no proprietary services.

Generates a small class-conditional LUS-like dataset (the reference's
on-disk contract: a frames dir of ``{clip}_{idx}.jpg`` plus frames/clips
CSVs — reference ``src/data/ab_line_dataset_creator.py:27-77``), writes a
derived ``config.yml`` into the workspace, then drives the full lifecycle
through the library API:

    train (single_train) -> checkpoint -> frame + clip predictions ->
    Grad-CAM heatmaps

and prints the artifact paths plus the matching CLI commands (every step
here has a CLI equivalent driven by the workspace config).

Run from the repo root (CPU works; a TPU just makes it faster)::

    python examples/quickstart_synthetic.py [--workspace DIR] [--epochs N]
"""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build_config(ws: str, fcsv: str, ccsv: str, fdir: str, epochs: int):
    """Derive a workspace config from the repo config.yml: redirect every
    PATHS output under the workspace, shrink the problem to quickstart
    size."""
    from ab_line_classifier_tpu.config import Config, load_config

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["PATHS"].update({
        "FRAME_TABLE": fcsv, "CLIPS_TABLE": ccsv, "FRAMES": fdir,
        "PARTITIONS": ws + "/partitions/",
        "MODEL_WEIGHTS": ws + "/results/models/",
        "MODEL_TO_LOAD": ws + "/results/models/latest",
        "METRICS": ws + "/results/metrics/",
        "BATCH_PREDS": ws + "/results/predictions/",
        "EXPERIMENTS": ws + "/results/experiments/",
        "LOGS": ws + "/results/logs/",
        "IMAGES": ws + "/results/figures/",
        "HEATMAPS": ws + "/img/heatmaps",
        "EXPERIMENT_VISUALIZATIONS": ws + "/img/experiments/",
        "CLASS_NAME_MAP": ws + "/class_map.json",
    })
    d["TRACKER"]["DIR"] = ws + "/results/runs/"
    d["DATA"]["IMG_DIM"] = [32, 32]
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EXPERIMENT_TYPE": "single_train",
                       "EPOCHS": epochs, "BATCH_SIZE": 16, "PATIENCE": 5,
                       "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    return Config(d)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="synthetic end-to-end quickstart")
    ap.add_argument("--workspace", default="quickstart_ws")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu: the quickstart is "
                         "CPU-sized, and on a TPU-attached host grabbing "
                         "the chip would contend with any training/bench "
                         "job; pass 'tpu' to run on the chip)")
    args = ap.parse_args()
    # An explicitly passed --platform wins over an exported ABLC_PLATFORM;
    # the env var only fills in when the flag is left at its default.
    if args.platform != ap.get_default("platform"):
        os.environ["ABLC_PLATFORM"] = args.platform
    else:
        os.environ.setdefault("ABLC_PLATFORM", args.platform)
    ws = os.path.abspath(args.workspace)
    os.makedirs(ws, exist_ok=True)

    from ab_line_classifier_tpu.data.synthetic import generate_dataset

    import jax

    # Say which backend actually won ('tpu' resolves to the registered
    # accelerator — e.g. 'axon' on tunneled hosts — or falls back to cpu
    # when none exists; the user should see which).
    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})")
    print(f"[1/4] generating synthetic dataset under {ws}")
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=24,
                                        clips_per_patient=2,
                                        frames_per_clip=6, hw=(48, 64),
                                        seed=3)
    cfg = build_config(ws, fcsv, ccsv, fdir, args.epochs)
    cfg_path = os.path.join(ws, "config.yml")
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
    print(f"      wrote {cfg_path} (use it with the CLIs: "
          f"ABLC_CONFIG={cfg_path})")

    print(f"[2/4] training cnn0 ({args.epochs} epochs, single_train)")
    from ab_line_classifier_tpu.train.experiment import perform_single_run

    result = perform_single_run(cfg, save_weights=True, verbose=True)
    print(f"      checkpoint: {result.model_dir}")
    scalars = {k: round(float(v), 3) for k, v in result.test_metrics.items()
               if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
    print(f"      test metrics: {scalars}")

    print("[3/4] frame + clip predictions")
    import pandas as pd

    from ab_line_classifier_tpu.data.pipeline import FrameDataset
    from ab_line_classifier_tpu.predict.predict import (
        compute_clip_predictions, compute_frame_predictions,
        default_predictor)

    # One restore + ONE frame sweep feeds both passes — the same pattern
    # as the predict CLI (each call would otherwise reload the checkpoint,
    # recompile, and re-predict the whole frame table).
    predictor = default_predictor(cfg)
    frame_probs = predictor.predict_dataset(
        FrameDataset(pd.read_csv(fcsv), fdir, img_dim=cfg.img_dim))
    clip_df = compute_clip_predictions(cfg, fcsv, ccsv, class_thresh=0.5,
                                       clip_algorithm="average",
                                       predictor=predictor,
                                       frame_probs=frame_probs)
    frame_df = compute_frame_predictions(cfg, fcsv, class_thresh=0.5,
                                         predictor=predictor,
                                         frame_probs=frame_probs)
    print(f"      {len(frame_df)} frame predictions, "
          f"{len(clip_df)} clip predictions -> "
          f"{cfg['PATHS']['BATCH_PREDS']}")

    print("[4/4] Grad-CAM heatmaps for 3 frames")
    from ab_line_classifier_tpu.explain.gradcam import GradCAMExplainer

    explainer = GradCAMExplainer(cfg)
    explainer.apply_gradcam(pd.read_csv(fcsv).head(3))
    print(f"      heatmap PNGs -> {cfg['PATHS']['HEATMAPS']}")

    print("\nDone. Follow-up CLI commands against this workspace:")
    for cmd in (
            "python -m ab_line_classifier_tpu.predict",
            "python -m ab_line_classifier_tpu.explain --limit 3",
            "python -m ab_line_classifier_tpu.export "
            f"--model {ws}/results/models/latest --out {ws}/model.onnx"):
        print(f"  ABLC_CONFIG={cfg_path} {cmd}")


if __name__ == "__main__":
    main()
