"""Deployment preprocessing parity (reference ``src/deploy.py``).

``ab_classifier_preprocess`` is the canonical on-device preprocessing used to
confirm train/serve parity for the WaveBase probe (reference
``deploy.py:15-33``): cv2-style INTER_NEAREST resize to (128,128) plus the
model's scaling function. ``predict_wavebase_mp4`` mimics on-device framewise
inference over a clip, including blanking the 50x160 top-left UI region
(reference ``deploy.py:36-68`` — which dereferences an undefined ``vid_path``;
fixed here).

The mp4 decode uses cv2, which in this environment must be imported before
any jax COMPUTATION has run in the process (importing it later hangs — an
OpenMP/XLA runtime clash, not an exception). ``predict_wavebase_mp4``
therefore decodes the clip before touching the checkpoint/model; if your
process has already executed jax, pre-decode with ``decode_mp4_frames`` in a
fresh process (or import cv2 at startup) and pass ``frames=``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
import pandas as pd

from ab_line_classifier_tpu.models import get_model
from ab_line_classifier_tpu.ops.image import nearest_indices

INPUT_SIZE = (128, 128)
N_CHANNELS = 3


def ab_classifier_preprocess(image: np.ndarray,
                             preprocessing_fn: Callable) -> np.ndarray:
    """Reference ``AB_classifier_preprocess`` (deploy.py:15-33): cv2
    INTER_NEAREST resize + model scaling, on a ``(1, H, W, 3)`` frame.
    Implemented with the same index map as cv2 (no cv2 dependency)."""
    frame = np.asarray(image)[0]
    h, w = frame.shape[:2]
    ridx = nearest_indices(h, INPUT_SIZE[0], "cv2")
    cidx = nearest_indices(w, INPUT_SIZE[1], "cv2")
    resized = frame[ridx][:, cidx].astype(np.float32)
    resized = resized.reshape((1, INPUT_SIZE[0], INPUT_SIZE[1], N_CHANNELS))
    return np.asarray(preprocessing_fn(resized))


def decode_mp4_frames(mp4_path: str) -> np.ndarray:
    """Decode all frames of an mp4 to uint8 [T, H, W, 3] RGB.

    WARNING: cv2 is imported here, and importing cv2 after jax computation
    has run in this process HANGS (it is not catchable); call this before
    any jax execution, or import cv2 at process startup."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "cv2 is required for mp4 decode (or pass pre-decoded frames=)"
        ) from e
    vc = cv2.VideoCapture(mp4_path)
    frames = []
    while True:
        ret, frame = vc.read()
        if not ret:
            break
        frames.append(frame[..., ::-1])  # BGR -> RGB
    vc.release()
    if not frames:
        raise ValueError(f"no frames decoded from {mp4_path!r}")
    return np.stack(frames)


def predict_wavebase_mp4(model_path: str, mp4_path: str, preds_path: str,
                         frames: Optional[np.ndarray] = None) -> np.ndarray:
    """Reference ``predict_wavebase_mp4`` (deploy.py:36-68): framewise A/B
    probabilities over a clip with the UI region blanked, written as a CSV
    ``Frame, A lines, B lines``.

    TPU-native difference: instead of a per-frame Python loop, the whole clip
    is ONE batched device pass — UI-blank + resize + normalize fused in the
    preprocessing kernel (``blank_ui_region=True``) and a single batched
    forward.

    :param frames: pre-decoded uint8 [T, H, W, 3] frames (skips mp4 decode —
        useful when cv2 is unavailable).
    """
    import jax
    import jax.numpy as jnp

    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.ops.preprocess_pallas import preprocess_frames
    from ab_line_classifier_tpu.utils import checkpoint as ckpt

    if frames is None:
        frames = decode_mp4_frames(mp4_path)

    variables, meta = ckpt.load_model(model_path)
    spec = build_model(meta["model_name"], meta["hparams"],
                       tuple(meta["input_shape"]), int(meta["n_classes"]))
    module = spec.module()
    # The reference hardcodes (128, 128) (deploy.py:28); serving the
    # checkpoint's own input size is identical there and also works for
    # models trained at other resolutions.
    out_hw = tuple(meta["input_shape"][:2])

    @jax.jit
    def serve(variables, frames_u8):
        x = preprocess_frames(frames_u8, out_hw=out_hw,
                              preprocess_mode=spec.preprocess_mode,
                              resize_mode="cv2", blank_ui_region=True,
                              out_dtype=jnp.float32)
        return module.apply(variables, x, train=False)

    preds = np.asarray(serve(variables, jnp.asarray(frames)))
    pred_df = pd.DataFrame({"Frame": np.arange(preds.shape[0]),
                            "A lines": preds[:, 0],
                            "B lines": preds[:, 1]})
    os.makedirs(os.path.dirname(os.path.abspath(preds_path)), exist_ok=True)
    pred_df.to_csv(preds_path, index=False)
    return preds


def check_preprocess_parity(frame: np.ndarray, model_name: str) -> float:
    """Train/serve parity check: max abs difference between the host
    reference preprocessing and the device kernel for one frame."""
    import jax.numpy as jnp

    from ab_line_classifier_tpu.models import get_preprocess_mode
    from ab_line_classifier_tpu.ops.image import fused_preprocess

    _, preprocessing_fn = get_model(model_name)
    host = ab_classifier_preprocess(frame[None], preprocessing_fn)
    device = np.asarray(fused_preprocess(
        jnp.asarray(frame[None]), out_hw=INPUT_SIZE,
        preprocess_mode=get_preprocess_mode(model_name), resize_mode="cv2"))
    return float(np.abs(host - device).max())
