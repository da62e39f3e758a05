"""Native C++ JPEG loader: parity with the PIL path, error handling."""

import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data import native
from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.data.synthetic import generate_dataset

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("native_ws"))
    fcsv, _, fdir = generate_dataset(ws, n_patients=4, clips_per_patient=2,
                                     frames_per_clip=4, hw=(96, 120), seed=1)
    return FrameDataset(pd.read_csv(fcsv), fdir, img_dim=(64, 64))


def test_native_matches_pil(dataset):
    paths = list(dataset.paths)
    for mode in ("tf", "cv2"):
        got = native.decode_jpeg_batch(paths, (64, 64), mode)
        ds = FrameDataset(dataset.df, dataset.frames_dir, img_dim=(64, 64),
                          resize_mode=mode, use_native=False)
        want = np.stack([ds.load_frame(i) for i in range(len(ds))])
        np.testing.assert_array_equal(got, want)


def test_pipeline_uses_native(dataset):
    ds_native = FrameDataset(dataset.df, dataset.frames_dir, img_dim=(64, 64),
                             use_native=True)
    ds_pil = FrameDataset(dataset.df, dataset.frames_dir, img_dim=(64, 64),
                          use_native=False)
    bn = next(ds_native.batches(8, prefetch=0))
    bp = next(ds_pil.batches(8, prefetch=0))
    np.testing.assert_array_equal(bn.images, bp.images)
    np.testing.assert_array_equal(bn.labels, bp.labels)

    an, _ = ds_native.load_all()
    ap, _ = ds_pil.load_all()
    np.testing.assert_array_equal(an, ap)


def test_bad_file_raises(dataset):
    with pytest.raises(RuntimeError, match="failed on 1/"):
        native.decode_jpeg_batch(["/nonexistent.jpg"], (64, 64))


def test_upscale_and_odd_sizes(dataset):
    # resize up and to non-square odd dims
    paths = list(dataset.paths)[:3]
    got = native.decode_jpeg_batch(paths, (130, 97), "tf")
    ds = FrameDataset(dataset.df.head(3), dataset.frames_dir,
                      img_dim=(130, 97), use_native=False)
    want = np.stack([ds.load_frame(i) for i in range(3)])
    np.testing.assert_array_equal(got, want)
