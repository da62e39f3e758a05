"""WaveBase-exported framewise-CSV clip predictors (reference
``src/predict.py:310-362``): the contiguity rule over device-exported
prediction CSVs and the batch clip-wise predictor over the dated
``RT_ROOT_DIR/<date>/recordings/`` tree."""

import glob
import os

import pandas as pd
import pytest

from conftest import REPO_ROOT

from ab_line_classifier_tpu.config import Config, load_config
from ab_line_classifier_tpu.predict.experiments import (
    compute_clip_predictions_wb, predict_clipwise_with_contiguity_threshold_wb)


def _preds(rows):
    """Headerless WaveBase CSV shape: col0 class name, col1 prob string."""
    return pd.DataFrame(rows).astype(str)


def test_contiguity_rule_requires_consecutive_frames():
    rows = [["B-Lines", "0.9"], ["A-Lines", "0.9"], ["B-Lines", "0.95"],
            ["B-Lines", "0.8"]]
    # Two B runs of length 1 and 2 — threshold 3 never met.
    assert not predict_clipwise_with_contiguity_threshold_wb(
        _preds(rows), "B-Lines", 3, 0.7)
    # Threshold 2 met by the trailing run.
    assert predict_clipwise_with_contiguity_threshold_wb(
        _preds(rows), "B-Lines", 2, 0.7)


def test_contiguity_rule_prob_must_exceed_threshold():
    # A confident-looking class label below the classification threshold
    # breaks the run (reference predict.py:321 uses strict >).
    rows = [["B-Lines", "0.9"], ["B-Lines", "0.7"], ["B-Lines", "0.9"]]
    assert not predict_clipwise_with_contiguity_threshold_wb(
        _preds(rows), "B-Lines", 2, 0.7)
    rows = [["B-Lines", "0.9"], ["B-Lines", "0.71"], ["B-Lines", "0.9"]]
    assert predict_clipwise_with_contiguity_threshold_wb(
        _preds(rows), "B-Lines", 2, 0.7)


@pytest.fixture()
def wb_workspace(tmp_path):
    root = tmp_path / "rt_root"
    rec = root / "2024-01-05" / "recordings"
    rec.mkdir(parents=True)
    # Clip with 3 contiguous confident B frames -> B-Line.
    _preds([["B-Lines", "0.9"]] * 3 + [["A-Lines", "0.8"]]).to_csv(
        rec / "clip_b_probs.csv", index=False, header=False)
    # Clip with interrupted B frames -> A-Line.
    _preds([["B-Lines", "0.9"], ["A-Lines", "0.9"], ["B-Lines", "0.9"],
            ["A-Lines", "0.9"], ["B-Lines", "0.9"]]).to_csv(
        rec / "clip_a_probs.csv", index=False, header=False)
    # A second dated dir is walked too.
    rec2 = root / "2024-02-11" / "recordings"
    rec2.mkdir(parents=True)
    _preds([["B-Lines", "0.99"]] * 5).to_csv(
        rec2 / "clip_c_probs.csv", index=False, header=False)

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["PATHS"]["RT_ROOT_DIR"] = str(root)
    d["PATHS"]["BATCH_PREDS"] = str(tmp_path / "preds")
    d["CLIP_PREDICTION"].update({"CONTIGUITY_THRESHOLD": 3,
                                 "CLASSIFICATION_THRESHOLD": 0.7})
    return tmp_path, Config(d)


def test_batch_clip_predictions(wb_workspace):
    tmp_path, cfg = wb_workspace
    res = compute_clip_predictions_wb(cfg)
    by_clip = dict(zip(res["filename"], res["prediction"]))
    # _probs.csv -> .mkv clip naming (reference predict.py:345).
    assert by_clip == {"clip_b.mkv": "B-Line", "clip_a.mkv": "A-Line",
                      "clip_c.mkv": "B-Line"}
    # Output CSV written under BATCH_PREDS with the reference's
    # rootdir/threshold-tagged naming (T{contiguity}_t0{threshold decimal}).
    outs = glob.glob(str(tmp_path / "preds" / "*.csv"))
    assert len(outs) == 1
    name = os.path.basename(outs[0])
    assert name.startswith("rt_root_clip_predictions_T3_t07_")
    saved = pd.read_csv(outs[0])
    assert list(saved.columns) == ["filename", "prediction"]
    assert len(saved) == 3
