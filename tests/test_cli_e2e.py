"""The installed CLI surface driven exactly as a user would: fresh
subprocesses of ``python -m ab_line_classifier_tpu.{train,predict,export}``
and ``.explain`` chained on one workspace via ``ABLC_CONFIG``.

The library behind each command is covered elsewhere
(tests/test_train_e2e.py etc.); what only a subprocess can regress-test is
the argparse plumbing, the ``ABLC_CONFIG`` env resolution, and each
module's import-time behavior — the surface the reference exposes as
``python src/train.py`` / ``python src/predict.py``
(reference ``src/train.py:374-375``, ``src/predict.py:450-459``).
"""

import glob
import os
import subprocess
import sys

import pytest
import yaml

from ab_line_classifier_tpu.data.synthetic import generate_dataset
from tests.conftest import REPO_ROOT, cli_env, derive_workspace_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("cli_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=12,
                                        clips_per_patient=2,
                                        frames_per_clip=4, hw=(48, 64),
                                        seed=7)
    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EXPERIMENT_TYPE": "single_train",
                       "EPOCHS": 2, "BATCH_SIZE": 16, "PATIENCE": 5,
                       "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    cfg_path = os.path.join(ws, "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
    return ws, cfg_path


def _run_cli(module, cfg_path, *args):
    env = cli_env(cfg_path)
    proc = subprocess.run(
        [sys.executable, "-m", f"ab_line_classifier_tpu.{module}", *args],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{module} failed:\n{proc.stderr[-4000:]}")
    return proc.stdout


def test_cli_lifecycle(workspace):
    ws, cfg_path = workspace

    # train: TRAIN.EXPERIMENT_TYPE from the config, weights saved.
    _run_cli("train", cfg_path)
    ckpts = [c for c in glob.glob(os.path.join(ws, "results", "models",
                                               "model*"))
             if os.path.isfile(os.path.join(c, "meta.json"))]
    assert ckpts, "train CLI left no checkpoint"

    # predict: clip + frame passes against MODEL_TO_LOAD (latest).
    _run_cli("predict", cfg_path)
    preds = glob.glob(os.path.join(ws, "results", "predictions", "*.csv"))
    assert any("clip" in os.path.basename(p) for p in preds)
    assert any("frame" in os.path.basename(p) for p in preds)
    assert glob.glob(os.path.join(ws, "results", "metrics", "*.json"))

    # explain: headless Grad-CAM (plusplus mode exercises the CLI flag).
    out = _run_cli("explain", cfg_path, "--limit", "2", "--mode", "plusplus")
    assert "wrote 2 heatmaps" in out
    assert len(glob.glob(os.path.join(ws, "img", "heatmaps", "*.png"))) == 2

    # export: checkpoint -> ONNX file.
    onnx_path = os.path.join(ws, "model.onnx")
    _run_cli("export", cfg_path, "--out", onnx_path, "--batch-size", "2")
    assert os.path.getsize(onnx_path) > 0

    # predict FROM the exported .onnx (the reference's alternate inference
    # format, reference predict.py:47-48): same CLI, MODEL_TO_LOAD swapped.
    with open(cfg_path) as f:
        d = yaml.safe_load(f)
    d["PATHS"]["MODEL_TO_LOAD"] = onnx_path
    d["PATHS"]["BATCH_PREDS"] = os.path.join(ws, "onnx_predictions") + os.sep
    onnx_cfg = os.path.join(ws, "config_onnx.yml")
    with open(onnx_cfg, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
    _run_cli("predict", onnx_cfg)
    onnx_preds = glob.glob(os.path.join(ws, "onnx_predictions", "*.csv"))
    assert any("clip" in os.path.basename(p) for p in onnx_preds)
    assert any("frame" in os.path.basename(p) for p in onnx_preds)


def test_predict_ext_val(workspace):
    """``predict --ext-val`` serves the external-validation dataset from
    PATHS.EXT_VAL_* (the reference documents these keys,
    README.md:168-170, but made users swap FRAME_TABLE/CLIPS_TABLE by
    hand). A second synthetic dataset stands in for the external one;
    outputs land in a distinct predictions dir."""
    import pandas as pd

    ws, cfg_path = workspace
    # Self-sufficient: train if no checkpoint exists yet (test order
    # independence, same pattern as test_profile_flags).
    if not glob.glob(os.path.join(ws, "results", "models", "model*")):
        _run_cli("train", cfg_path)
    ext = os.path.join(ws, "ext")
    e_fcsv, e_ccsv, e_fdir = generate_dataset(ext, n_patients=4,
                                              clips_per_patient=1,
                                              frames_per_clip=4, hw=(48, 64),
                                              seed=21)
    d = yaml.safe_load(open(cfg_path))
    d["PATHS"].update({"EXT_VAL_FRAME_TABLE": e_fcsv,
                       "EXT_VAL_CLIPS_TABLE": e_ccsv,
                       "EXT_VAL_FRAMES": e_fdir,
                       "BATCH_PREDS": os.path.join(ws, "ext_predictions")
                       + os.sep})
    ext_cfg = os.path.join(ws, "config_ext.yml")
    yaml.safe_dump(d, open(ext_cfg, "w"), sort_keys=False)

    _run_cli("predict", ext_cfg, "--ext-val")
    preds = glob.glob(os.path.join(ws, "ext_predictions", "*.csv"))
    assert preds, "no external-validation prediction CSVs"
    # Both passes carry the frames-table stem (README divergence list —
    # the reference's frame pass was stem-less, predict.py:220, so
    # ext-val outputs could not be told apart from in-distribution ones).
    frame_preds = [p for p in preds if "_frames_predictions"
                   in os.path.basename(p)]
    clip_preds = [p for p in preds if "_clips_predictions"
                  in os.path.basename(p)]
    assert frame_preds and clip_preds, [os.path.basename(p) for p in preds]
    assert len(pd.read_csv(frame_preds[0])) == len(pd.read_csv(e_fcsv))
    assert len(pd.read_csv(clip_preds[0])) == len(pd.read_csv(e_ccsv))


def test_explain_frames_selection(workspace):
    """``explain --frames`` selects table rows by basename (full paths
    accepted) and exits with an error when nothing matches."""
    ws, cfg_path = workspace
    _run_cli("train", cfg_path)  # ensure a checkpoint exists (no ordering)

    import pandas as pd

    with open(cfg_path) as f:
        frame_table = yaml.safe_load(f)["PATHS"]["FRAME_TABLE"]
    name = pd.read_csv(frame_table)["Frame Path"].iloc[3]
    out = _run_cli("explain", cfg_path, "--frames",
                   os.path.join("/some/prefix", name))
    assert "wrote 1 heatmaps" in out

    proc = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.explain",
         "--frames", "no_such_frame.jpg"],
        env=cli_env(cfg_path), cwd=REPO_ROOT, capture_output=True,
        text=True, timeout=900)
    assert proc.returncode != 0
    assert "no_such_frame.jpg" in proc.stderr


def test_profile_flags(workspace):
    """``train --profile`` / ``predict --profile`` wrap the run in a
    jax.profiler trace and leave TensorBoard-viewable artifacts under
    <PATHS.LOGS>/profiles."""
    ws, cfg_path = workspace
    prof_dir = os.path.join(ws, "results", "logs", "profiles")

    # Save weights so the predict step below has a checkpoint regardless
    # of whether any sibling test ran first (no inter-test ordering).
    out = _run_cli("train", cfg_path, "--profile")
    assert f"profiler trace written to {prof_dir}" in out
    n_train = len(glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                            recursive=True))
    assert n_train > 0

    out = _run_cli("predict", cfg_path, "--profile")
    assert f"profiler trace written to {prof_dir}" in out
    n_predict = len(glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                              recursive=True))
    assert n_predict > n_train

    out = _run_cli("explain", cfg_path, "--profile", "--limit", "1")
    assert f"profiler trace written to {prof_dir}" in out
    assert len(glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                         recursive=True)) > n_predict
