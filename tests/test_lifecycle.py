"""ONE raw-clip lifecycle: the reference's whole story in a single pass.

Every stage is e2e-tested on its own elsewhere (ETL chains in test_etl,
automask CLI, train->predict->export in test_cli_e2e); this test runs the
actual reference call stack END TO END in one run so cross-module seams
cannot compose wrong: synthetic source mp4s -> ``ABLineDatasetCreator.
create_dataset()`` (stubbed fetch; reference
ab_line_dataset_creator.py:150-154) -> U-Net auto-mask -> frame
decomposition + frames table -> ``single_train`` -> clip predictions ->
Grad-CAM heatmap PNG via the explain CLI (reference gradcam.py:94-118).

The seams this exercises for real: frame naming ``{clip}_{idx}.jpg``
feeding the clip-substring matcher, masked-clip ROI crops feeding the
IMG_DIM resize, the ETL clips table feeding both the train split and the
clip-prediction table.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

from conftest import cli_env, derive_workspace_config

pytestmark = pytest.mark.slow


def _write_source_mp4(path: str, seed: int, bright: bool,
                      n_frames: int = 6, hw=(96, 96)) -> None:
    """A synthetic probe clip: dark speckle with a central disc whose
    intensity differs by class, so the trained model has signal."""
    import cv2

    h, w = hw
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (w, h), True)
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:h, :w]
    disc = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 3) ** 2
    lo, hi = (150, 255) if bright else (40, 110)
    for _ in range(n_frames):
        frame = rng.randint(0, 40, (h, w, 3), np.uint8)
        frame[disc] = rng.randint(lo, hi, (int(disc.sum()), 3), np.uint8)
        writer.write(frame)
    writer.release()


def test_raw_clips_to_heatmap_lifecycle(tmp_path):
    from test_automask_cli import _write_keras_unet_h5

    ws = str(tmp_path)
    data = os.path.join(ws, "data")
    os.makedirs(data)
    fcsv = os.path.join(data, "frames.csv")
    ccsv = os.path.join(data, "clips.csv")
    fdir = os.path.join(data, "frames/")

    # --- source media + "database": 12 patients, 1 clip each, two labels
    # (plus one non_a_non_b and one homogeneous row the labeler must drop).
    # 12 patients: the grouped splitter builds 1/TEST_SPLIT=10 folds, which
    # needs >= 10 patient groups.
    src = os.path.join(ws, "s3")
    os.makedirs(src)
    rows = []
    for i in range(12):
        clip_id = 100 + i
        bright = i % 2 == 1
        _write_source_mp4(os.path.join(src, f"{clip_id}.mp4"), seed=i,
                          bright=bright)
        rows.append({"patient_id": f"p{i}",
                     "a_or_b_lines": ("b_lines_<_3" if bright
                                      else "a_lines"),
                     "id": clip_id, "s3_path": f"stub://{clip_id}",
                     "frame_homogeneity": None})
    rows.append({"patient_id": "p90", "a_or_b_lines": "non_a_non_b",
                 "id": 900, "s3_path": "stub://900",
                 "frame_homogeneity": None})
    rows.append({"patient_id": "p91", "a_or_b_lines": "a_lines", "id": 901,
                 "s3_path": "stub://901", "frame_homogeneity": 1.0})
    qcsv = os.path.join(data, "query.csv")
    pd.DataFrame(rows).to_csv(qcsv, index=False)

    unet_h5 = os.path.join(ws, "unet.h5")
    _write_keras_unet_h5(unet_h5)

    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["PATHS"].update({
        "QUERY_TABLE": qcsv,
        "RAW_CLIPS": os.path.join(ws, "raw_clips/"),
        "MASKED_CLIPS": os.path.join(ws, "masked_clips/"),
        "AUTOMASK_MODEL_PATH": unet_h5,
    })
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 2, "BATCH_SIZE": 8,
                       "PATIENCE": 5, "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    from ab_line_classifier_tpu.config import Config
    cfg = Config(d)

    # --- stage 1: the full ETL chain in one call (query -> pull -> mask ->
    # frames table), exactly the reference's __main__ entry.
    from ab_line_classifier_tpu.data.ab_line_dataset_creator import (
        ABLineDatasetCreator)

    def fake_fetch(url, out):
        clip = url.split("//")[1]
        with open(os.path.join(src, f"{clip}.mp4"), "rb") as f:
            with open(out, "wb") as g:
                g.write(f.read())

    ABLineDatasetCreator(cfg, fetch_fn=fake_fetch).create_dataset()

    clips_df = pd.read_csv(ccsv)
    assert len(clips_df) == 12         # non_a_non_b + homogeneous dropped
    assert set(clips_df["class"]) == {0, 1}

    frames_df = pd.read_csv(fcsv)
    assert len(frames_df) == 12 * 6
    # The {clip}_{idx}.jpg naming seam the clip matcher depends on:
    assert frames_df["Frame Path"].str.match(r"\d+_\d+\.jpg").all()
    for p in frames_df["Frame Path"]:
        assert os.path.isfile(os.path.join(fdir, p)), p

    # --- stage 2: train on the ETL output (patient-grouped on-the-fly
    # split of the frames table, reference train.py:171-246).
    from ab_line_classifier_tpu.train.experiment import perform_single_run

    result = perform_single_run(cfg, save_weights=True, verbose=False)
    assert result.model_dir is not None
    assert "accuracy" in result.test_metrics

    # --- stage 3: clip predictions over the ETL clips (the reference's
    # clip table carries filename+class for the matcher, predict.py:125-188).
    pred_clips = os.path.join(data, "clips_pred.csv")
    pd.DataFrame({"filename": clips_df["id"].astype(str),
                  "class": clips_df["class"]}).to_csv(pred_clips,
                                                      index=False)
    from ab_line_classifier_tpu.predict.predict import (
        compute_clip_predictions)

    clip_preds = compute_clip_predictions(cfg, fcsv, pred_clips,
                                          class_thresh=0.5,
                                          clip_algorithm="average")
    assert len(clip_preds) == 12
    assert set(clip_preds["class"]) <= {0, 1}
    assert glob.glob(os.path.join(ws, "results/metrics/*_clips_*.json") +
                     "") or glob.glob(
        os.path.join(ws, "results/metrics/clips_*.json"))

    # --- stage 4: Grad-CAM heatmap PNGs through the real explain CLI on
    # one of the ETL-produced frames.
    d["PATHS"]["MODEL_TO_LOAD"] = result.model_dir
    cfg_path = os.path.join(ws, "config_lifecycle.yml")
    yaml.safe_dump(d, open(cfg_path, "w"))
    frame_name = frames_df["Frame Path"].iloc[0]
    r = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.explain",
         "--frames", frame_name],
        env=cli_env(cfg_path), capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, (r.stdout + r.stderr)[-800:]
    pngs = glob.glob(os.path.join(ws, "img/heatmaps/*"))
    assert pngs, "explain CLI produced no heatmap files"
