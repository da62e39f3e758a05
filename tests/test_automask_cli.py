"""The standalone auto-masking CLI driven as a subprocess — the successor to
the reference's only argparse surface (reference ``src/data/auto_masking.py:
110-137``): ``python -m ab_line_classifier_tpu.data.auto_masking -i <clips>
-o <out> -m <unet.h5> -f mp4``.

Covers, end to end in a fresh process: the Keras ``.h5`` U-Net restore path
(the reference's pretrained format), frame sampling from an mp4, the
batched mask chain (downsample -> U-Net -> threshold -> morphology ->
majority vote), and the masked-mp4 + ``mask.jpg`` output contract.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, cli_env

pytestmark = pytest.mark.slow


def _write_keras_unet_h5(path: str, base_filters: int = 16,
                         levels: int = 4, size: int = 32) -> None:
    """The Keras twin of models/unet.UNet at the CLI's default width
    (same construction as tests/test_keras_parity.py's golden round-trip,
    which proves forward agreement after import)."""
    from tensorflow.keras import Model
    from tensorflow.keras import layers as L

    inp = L.Input((size, size, 1))
    x, skips = inp, []
    for lv in range(levels):
        f = base_filters * 2 ** lv
        x = L.Conv2D(f, 3, padding="same", activation="relu")(x)
        x = L.Conv2D(f, 3, padding="same", activation="relu")(x)
        skips.append(x)
        x = L.MaxPool2D(2)(x)
    f = base_filters * 2 ** levels
    x = L.Conv2D(f, 3, padding="same", activation="relu")(x)
    x = L.Conv2D(f, 3, padding="same", activation="relu")(x)
    for lv in reversed(range(levels)):
        f = base_filters * 2 ** lv
        x = L.Conv2DTranspose(f, 2, strides=2, padding="same")(x)
        x = L.Concatenate()([x, skips[lv]])
        x = L.Conv2D(f, 3, padding="same", activation="relu")(x)
        x = L.Conv2D(f, 3, padding="same", activation="relu")(x)
    out = L.Conv2D(1, 1, activation="sigmoid")(x)
    Model(inp, out).save(path)


def _write_mp4(path: str, n_frames: int = 8, hw=(96, 96)) -> None:
    import cv2

    h, w = hw
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (w, h), True)
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:h, :w]
    disc = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 3) ** 2
    for _ in range(n_frames):
        frame = rng.randint(0, 40, (h, w, 3), np.uint8)
        frame[disc] = rng.randint(120, 255, (int(disc.sum()), 3), np.uint8)
        writer.write(frame)
    writer.release()


def test_automask_cli_masks_a_clip(tmp_path):
    clips = tmp_path / "clips"
    out = tmp_path / "masked"
    clips.mkdir()
    out.mkdir()
    h5 = str(tmp_path / "unet.h5")
    _write_keras_unet_h5(h5)
    _write_mp4(str(clips / "clip0.mp4"))

    env = cli_env()
    proc = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.data.auto_masking",
         "-i", str(clips), "-o", str(out), "-m", h5, "-f", "mp4"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # Output contract: a per-clip directory holding the masked mp4 plus
    # the clip mask image (reference auto_masking.py:97-104).
    masked = out / "clip0" / "clip0.mp4"
    assert masked.is_file() and masked.stat().st_size > 0
    import cv2

    mask = cv2.imread(str(out / "clip0" / "mask.jpg"), cv2.IMREAD_GRAYSCALE)
    assert mask is not None and mask.shape == (96, 96)

    cap = cv2.VideoCapture(str(masked))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 8
