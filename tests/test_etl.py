"""ETL layer tests: query labeling, dataset creator plumbing, real-time
annotation mapping, auto-mask compute path, deploy parity."""

import os

import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.config import Config, load_config
from ab_line_classifier_tpu.data.ab_line_dataset_creator import (
    ABLineDatasetCreator, LABEL_TO_CLASS_MAP)
from ab_line_classifier_tpu.data.real_time import (
    _rt_label_to_class, create_rt_ABline_dataframe)
from tests.conftest import REPO_ROOT


def _cfg(**paths):
    cfg = load_config(os.path.join(REPO_ROOT, "config.yml"))
    d = cfg.to_dict()
    d["PATHS"].update(paths)
    return Config(d)


def test_query_labeling():
    df = pd.DataFrame({
        "patient_id": ["p1", "p2", "p3", "p4", "p5", "p6"],
        "id": [1, 2, 3, 4, 5, 6],
        "a_or_b_lines": ["a_lines", "b_lines_<_3", "non_a_non_b", None,
                         "b_lines-_severe_(>50%_pleural_line)", "a_lines"],
        "frame_homogeneity": [None, None, None, None, None, 0.9],
        "s3_path": [f"s3://x/{i}" for i in range(6)],
    })
    out = ABLineDatasetCreator.label_query_results(df)
    # drops: non_a_non_b (3), unlabeled (4), homogeneous (6)
    assert list(out["id"]) == [1, 2, 5]
    assert list(out["class"]) == [0, 1, 1]
    # severities collapsed to 'b_lines'
    assert list(out["a_or_b_lines"]) == ["a_lines", "b_lines", "b_lines"]


def test_label_map_covers_reference_labels():
    assert LABEL_TO_CLASS_MAP["a_lines"] == 0
    for sev in ("b_lines_<_3", "b_lines-_moderate_(<50%_pleural_line)",
                "b_lines-_severe_(>50%_pleural_line)", "b_lines_3"):
        assert LABEL_TO_CLASS_MAP[sev] == 1
    assert LABEL_TO_CLASS_MAP["non_a_non_b"] == 2


def test_database_pull_with_stub_fetch(tmp_path):
    clips_csv = tmp_path / "clips.csv"
    pd.DataFrame({"id": [10, 11], "s3_path": ["u/a", "u/b"],
                  "patient_id": ["p", "q"], "class": [0, 1]}).to_csv(
        clips_csv, index=False)
    fetched = []
    cfg = _cfg(CLIPS_TABLE=str(clips_csv), RAW_CLIPS=str(tmp_path / "raw") + "/")

    class Creator(ABLineDatasetCreator):
        def query_to_df(self):
            pass

        def build_dataset(self):
            pass

    def fake_fetch(url, out):
        fetched.append((url, out))
        with open(out, "wb") as f:
            f.write(b"clip")

    c = Creator(cfg, fetch_fn=fake_fetch)
    c.database_pull()
    assert [u for u, _ in fetched] == ["u/a", "u/b"]
    # Fetches stage to a .part name; success renames to the final clip id.
    assert fetched[0][1].endswith("10.mp4.part")
    raw = sorted(os.listdir(str(tmp_path / "raw")))
    assert raw == ["10.mp4", "11.mp4"]


def test_database_pull_counts_failures_and_leaves_no_partials(tmp_path):
    """A mid-transfer failure (URLError/ContentTooShortError, not just
    HTTPError) is counted per the docstring contract and the truncated
    staging file is removed — never left as a final-named mp4 for a later
    auto_mask/build run to ingest."""
    import urllib.error

    clips_csv = tmp_path / "clips.csv"
    pd.DataFrame({"id": [10, 11], "s3_path": ["u/a", "u/b"],
                  "patient_id": ["p", "q"], "class": [0, 1]}).to_csv(
        clips_csv, index=False)
    cfg = _cfg(CLIPS_TABLE=str(clips_csv), RAW_CLIPS=str(tmp_path / "raw") + "/")

    class Creator(ABLineDatasetCreator):
        def query_to_df(self):
            pass

        def build_dataset(self):
            pass

    def flaky_fetch(url, out):
        with open(out, "wb") as f:
            f.write(b"trunc")
        if url == "u/a":
            raise urllib.error.ContentTooShortError("reset mid-body", b"")

    c = Creator(cfg, fetch_fn=flaky_fetch)
    c.database_pull()  # must not raise: failures are counted, not fatal
    raw = sorted(os.listdir(str(tmp_path / "raw")))
    assert raw == ["11.mp4"]  # no 10.mp4, no *.part leftovers


def test_rt_label_mapping():
    assert _rt_label_to_class("a_lines", "b_lines") == 0
    assert _rt_label_to_class("b_lines_3", "b_lines") == 1
    assert _rt_label_to_class("b_lines_3", "a_lines") == 0  # configurable
    assert _rt_label_to_class("b_lines_severe_50_pleural_line", "b_lines") == 1
    assert _rt_label_to_class("non_a_non_b", "b_lines") == 0
    assert _rt_label_to_class("mystery", "b_lines") == -1


def test_rt_dataframe_from_csv(tmp_path):
    annot = tmp_path / "annot.csv"
    pd.DataFrame({"filename": [111, 222],
                  "a_or_b_lines": ["a_lines", "b_lines_3"]}).to_csv(
        annot, index=False)
    rt_root = tmp_path / "prospective"
    rec = rt_root / "2024-01-01" / "masked_recordings"
    rec.mkdir(parents=True)
    (rec / "111.mp4").write_bytes(b"")
    cfg = _cfg(RT_ROOT_DIR=str(rt_root) + "/",
               RT_LABELBOX_ANNOTATIONS=str(annot))
    df = create_rt_ABline_dataframe(cfg, preprocessed=True)
    assert set(df["filename"]) == {111, 222}
    row111 = df[df["filename"] == 111].iloc[0]
    assert row111["class"] == 0 and isinstance(row111["Path"], str)


def test_automask_clip_mask():
    from ab_line_classifier_tpu.data.auto_masking import UnetSegmentation
    seg = UnetSegmentation(model_path=None)  # random init
    frames = np.random.RandomState(0).randint(
        0, 256, (4, 96, 128, 3)).astype(np.uint8)
    mask, bbox = seg.clip_mask(frames, (96, 128), edge_preserve=0.95)
    assert mask.shape == (96, 128)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert len(bbox) == 4
    masked = seg.mask_frames(frames, mask)
    assert masked.shape == frames.shape
    # masked-out pixels are zero
    assert np.all(masked[:, mask == 0] == 0)


def test_skimage_downsample_matches_scipy_golden():
    """The automask downsample equals the reference's skimage 0.19.1 resize
    chain, computed independently with scipy.ndimage (what skimage calls
    under the hood): ``gaussian_filter(sigma=(factor-1)/2, mode='grid-
    constant')`` then ``zoom(order=1, grid_mode=True)`` (reference
    ``src/data/auto_masking.py:69`` + ``requirements.txt:10``)."""
    import scipy.ndimage as ndi

    from ab_line_classifier_tpu.ops.image import (antialias_sigma,
                                                  skimage_downsample)

    rng = np.random.RandomState(7)
    img = (rng.rand(240, 320) * 255).astype(np.float32)
    out = np.asarray(skimage_downsample(img[None], (128, 128)))[0]

    sigma = antialias_sigma((240, 320), (128, 128))
    assert sigma[0] > 0 and sigma[1] > 0
    filtered = ndi.gaussian_filter(img.astype(np.float64), sigma,
                                   mode="grid-constant", cval=0.0)
    expected = ndi.zoom(filtered, (128 / 240, 128 / 320), order=1,
                        mode="grid-constant", cval=0.0, grid_mode=True)
    np.testing.assert_allclose(out, expected, atol=2e-3)

    # No-downscale input passes through un-blurred (sigma 0 on both axes).
    small = (rng.rand(128, 128) * 255).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(skimage_downsample(small[None], (128, 128)))[0], small,
        atol=1e-5)


def test_deploy_parity_exact():
    from ab_line_classifier_tpu.predict.deploy import check_preprocess_parity
    frame = np.random.RandomState(1).randint(
        0, 256, (240, 320, 3)).astype(np.uint8)
    for model in ("cutoffvgg16", "mobilenetv2", "efficientnetb7"):
        assert check_preprocess_parity(frame, model) < 1e-5


def test_rt_image_dataset_end_to_end(tmp_path):
    """Full prospective chain (reference real_time.py:108-127): the WaveBase
    layout nests each clip in its own id-directory
    (``masked_recordings/{id}/{id}.mp4`` — the Path column points at the
    id-dir, and the frame-table glob appends ``/{id}.mp4``); frames
    decompose to ``{id}_{idx}.jpg`` with the reference's exact columns and
    no patient_id."""
    cv2 = pytest.importorskip("cv2")

    annot = tmp_path / "annot.csv"
    pd.DataFrame({"filename": [111, 222],
                  "a_or_b_lines": ["a_lines", "b_lines_3"]}).to_csv(
        annot, index=False)
    rt_root = tmp_path / "prospective"
    for clip_id in (111, 222):
        d = rt_root / "2024-01-01" / "masked_recordings" / str(clip_id)
        d.mkdir(parents=True)
        vw = cv2.VideoWriter(str(d / f"{clip_id}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        rng = np.random.RandomState(clip_id)
        for _ in range(3):
            vw.write(rng.randint(0, 256, (48, 64, 3), np.uint8))
        vw.release()

    cfg = _cfg(RT_ROOT_DIR=str(rt_root) + "/",
               RT_LABELBOX_ANNOTATIONS=str(annot),
               FRAMES=str(tmp_path / "frames"),
               FRAME_TABLE=str(tmp_path / "rt_frames.csv"))
    from ab_line_classifier_tpu.data.real_time import create_rt_image_dataset

    clips_csv = str(tmp_path / "clips.csv")
    create_rt_ABline_dataframe(cfg, preprocessed=True).to_csv(clips_csv,
                                                              index=False)
    create_rt_image_dataset(cfg, clips_csv)
    out = pd.read_csv(cfg["PATHS"]["FRAME_TABLE"])
    assert list(out.columns) == ["Frame Path", "Class", "Class Name"]
    assert len(out) == 6  # 2 clips x 3 frames
    assert set(out["Class Name"]) == {"a_lines", "b_lines"}
    # frames materialized on disk with the {clip}_{idx}.jpg contract
    import os
    assert os.path.isfile(os.path.join(cfg["PATHS"]["FRAMES"], "111_0.jpg"))


def test_predict_wavebase_mp4_end_to_end(tmp_path):
    """Deploy-path clip prediction (reference deploy.py:36-68): one batched
    device pass over pre-decoded frames writes the ``Frame, A lines,
    B lines`` CSV, and the 50x160 top-left UI region is blanked before
    resize (reference deploy.py:56) — frames differing ONLY there must
    predict identically."""
    import jax

    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.predict.deploy import predict_wavebase_mp4
    from ab_line_classifier_tpu.utils import checkpoint as ckpt

    hp = {"LR": 1e-3, "DROPOUT": 0.35, "L2_LAMBDA": 1e-4,
          "NODES_DENSE0": 8, "KERNEL_SIZE": 3, "STRIDES": 1,
          "MAXPOOL_SIZE": 2, "BLOCKS": 1, "INIT_FILTERS": 4,
          "FILTER_EXP_BASE": 2}
    spec = build_model("cnn0", hp, (32, 32, 3), 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    model_dir = str(tmp_path / "model")
    ckpt.save_model(model_dir, v, meta={
        "model_name": "cnn0", "hparams": hp, "input_shape": [32, 32, 3],
        "n_classes": 2, "classes": ["a_lines", "b_lines"],
        "preprocess_mode": spec.preprocess_mode, "mixed_precision": False})

    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (5, 64, 192, 3)).astype(np.uint8)
    csv_path = str(tmp_path / "wb_preds.csv")
    preds = predict_wavebase_mp4(model_dir, "unused.mp4", csv_path,
                                 frames=frames)
    assert preds.shape == (5, 2)
    np.testing.assert_allclose(preds.sum(-1), 1.0, atol=1e-5)
    df = pd.read_csv(csv_path)
    assert list(df.columns) == ["Frame", "A lines", "B lines"]
    assert len(df) == 5

    # UI blanking: scribbling over [0:50, 0:160] must not change anything.
    scribbled = frames.copy()
    scribbled[:, 0:50, 0:160] = rs.randint(0, 255, (5, 50, 160, 3))
    preds2 = predict_wavebase_mp4(model_dir, "unused.mp4",
                                  str(tmp_path / "wb2.csv"),
                                  frames=scribbled)
    np.testing.assert_array_equal(preds, preds2)
