"""Grad-CAM explainability as a single fused forward+gradient pass.

The reference runs, *per frame*, an eager ``tf.GradientTape`` over a
two-output Keras model — one full forward for predictions, another
forward+backward per frame inside a Python loop (reference
``src/explainability/gradcam.py:42-91``). Here the whole thing is ONE jitted
program over a *batch* of frames:

    preprocess -> forward to the last conv (A) -> ``jax.vjp`` through the
    rest of the graph -> class scores + dScore/dA -> weighted channel sum ->
    ReLU -> per-image normalize -> bilinear upsample to IMG_DIM

so logits and heatmaps come out of the same compiled pass. The last conv
layer is found by graph kind (the analogue of the reference's
``_keras_api_names`` scan, gradcam.py:33-38).

Both weighting modes declared in the reference config are implemented
(``EXPLAINABILITY.GRAD_CAM.MODE``, config.yml:195-197): ``normal``
(global-average-pooled gradients) and ``plusplus`` (Grad-CAM++ alpha
weighting) — the reference only ever implemented ``normal``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ab_line_classifier_tpu.config import Config
from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.models.common import ModelSpec
from ab_line_classifier_tpu.ops.image import fused_preprocess
from ab_line_classifier_tpu.utils import checkpoint as ckpt
from ab_line_classifier_tpu.viz.visualization import visualize_heatmap

JET_ANCHORS = np.array([
    # OpenCV COLORMAP_JET-style RGB anchors at t = 0, .125, .375, .625, .875, 1
    [0, 0, 128], [0, 0, 255], [0, 255, 255], [255, 255, 0], [255, 0, 0],
    [128, 0, 0]], dtype=np.float32)
JET_POS = np.array([0.0, 0.125, 0.375, 0.625, 0.875, 1.0], dtype=np.float32)


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """Map [0,1] heat values to JET RGB uint8 (cv2.applyColorMap parity in
    shape/spirit without importing cv2 on the jax hot path)."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    out = np.stack([np.interp(x, JET_POS, JET_ANCHORS[:, c])
                    for c in range(3)], axis=-1)
    return out.astype(np.uint8)


def heatmap_overlay(orig_img: np.ndarray, cam: np.ndarray,
                    intensity: float = 0.5) -> np.ndarray:
    """JET-colormapped heat blended over the original frame (reference
    gradcam.py:82-83: 0.5/0.5 addWeighted)."""
    heat_rgb = jet_colormap(cam).astype(np.float32)
    blend = (heat_rgb * intensity
             + np.asarray(orig_img, np.float32) * (1.0 - intensity))
    return np.clip(blend, 0, 255).astype(np.uint8)


def build_fused_gradcam(spec: ModelSpec, mode: str = "normal",
                        prep_fn=None, out_hw: Optional[Tuple[int, int]] = None):
    """One jitted probs+heatmap pass (shared by :class:`GradCAMExplainer`
    and the per-epoch prediction-table callback).

    :param prep_fn: uint8 frames -> model input; defaults to the fused
        device preprocess (resize + normalize). Callers whose frames are
        already at model resolution pass just the normalization.
    :param out_hw: heatmap output size (defaults to the model input size).
    """
    from ab_line_classifier_tpu import graph as G

    conv = spec.last_conv_layer
    head_module = spec.module()                       # full graph
    cut_module = G.GraphModule(graph=spec.graph.cut(conv))
    hw = tuple(out_hw or spec.input_shape[:2])
    if prep_fn is None:
        def prep_fn(u8):
            return fused_preprocess(u8, out_hw=tuple(spec.input_shape[:2]),
                                    preprocess_mode=spec.preprocess_mode)

    @jax.jit
    def fused(variables, frames_u8):
        x = prep_fn(frames_u8)
        a = cut_module.apply(variables, x, train=False)

        def head(a_):
            return head_module.apply(variables, x, train=False,
                                     overrides={conv: a_})

        probs, vjp_fn = jax.vjp(head, a)
        cls = jnp.argmax(probs, axis=-1)
        cotangent = jax.nn.one_hot(cls, probs.shape[-1], dtype=probs.dtype)
        grads = vjp_fn(cotangent)[0]                  # dScore/dA [B,h,w,C]

        if mode == "plusplus":
            # Grad-CAM++ (Chattopadhay et al. 2018): alpha-weighted
            # positive gradients.
            g2 = grads * grads
            g3 = g2 * grads
            denom = 2.0 * g2 + jnp.sum(a * g3, axis=(1, 2), keepdims=True)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, g2 / denom, 0.0)
            weights = jnp.sum(alpha * jax.nn.relu(grads), axis=(1, 2))
        else:
            # 'normal': channel-mean pooled gradients (reference
            # gradcam.py:74).
            weights = jnp.mean(grads, axis=(1, 2))

        cam = jnp.einsum("bhwc,bc->bhw", a, weights)
        cam = jax.nn.relu(cam)
        cam_max = jnp.max(cam, axis=(1, 2), keepdims=True)
        cam = cam / jnp.maximum(cam_max, 1e-12)
        # Bilinear upsample on device (reference resizes with cv2 default
        # bilinear, gradcam.py:81).
        cam = jax.image.resize(cam, (cam.shape[0],) + hw, "bilinear")
        return probs, cam

    return fused


class GradCAMExplainer:
    """Reference ``GradCAMExplainer`` (gradcam.py:20-118) on a fused pass."""

    def __init__(self, cfg: Config, spec: Optional[ModelSpec] = None,
                 variables: Optional[Dict] = None, mode: Optional[str] = None):
        if spec is None or variables is None:
            # Fill in only what the caller left out — a provided spec (or
            # provided variables) must never be silently replaced by the
            # checkpoint's, or heatmaps would explain a different model
            # than the one passed in.
            loaded_vars, meta = ckpt.load_model(cfg["PATHS"]["MODEL_TO_LOAD"])
            if variables is None:
                variables = loaded_vars
            if spec is None:
                # mixed_precision comes from the checkpoint meta exactly
                # like Predictor.restore — otherwise a bf16-serving
                # checkpoint would be explained through an f32 graph and
                # borderline frames' annotated class could disagree with
                # what the served model predicts.
                spec = build_model(meta["model_name"], meta["hparams"],
                                   tuple(meta["input_shape"]),
                                   int(meta["n_classes"]),
                                   mixed_precision=bool(
                                       meta.get("mixed_precision", False)))
        self.cfg = cfg
        self.spec = spec
        self.variables = variables
        self.img_dim = tuple(cfg.img_dim)
        self.classes = cfg.classes
        self.save_img_dir = cfg["PATHS"]["HEATMAPS"]
        self.frames_dir = cfg["PATHS"]["FRAMES"]
        self.hm_intensity = 0.5
        self.mode = (mode or cfg["EXPLAINABILITY"]["GRAD_CAM"]["MODE"]).lower()
        self.conv_layer = spec.last_conv_layer
        self._fused = self._build_fused()

    # ------------------------------------------------------------------
    def _build_fused(self):
        return build_fused_gradcam(self.spec, self.mode, out_hw=self.img_dim)

    # ------------------------------------------------------------------
    def explain_frames(self, frames_u8: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch of uint8 frames -> (probs [B,C], heatmaps [B,H,W] in
        [0,1]) from one compiled pass."""
        probs, cam = self._fused(self.variables, jnp.asarray(frames_u8))
        return np.asarray(probs), np.asarray(cam)

    def heatmap_overlay(self, orig_img: np.ndarray,
                        cam: np.ndarray) -> np.ndarray:
        return heatmap_overlay(orig_img, cam, self.hm_intensity)

    def apply_gradcam(self, frame_df: pd.DataFrame,
                      save: bool = True) -> np.ndarray:
        """Reference ``apply_gradcam`` (gradcam.py:42-91): heatmap PNG per
        frame table row, returns the last heatmap."""
        ds = FrameDataset(frame_df, self.frames_dir, img_dim=self.img_dim)
        heatmap = None
        for batch in ds.batches(min(32, max(1, len(ds)))):
            valid = batch.mask > 0
            probs, cams = self.explain_frames(batch.images)
            for j in np.nonzero(valid)[0]:
                row = frame_df.iloc[int(batch.indices[j])]
                orig = batch.images[j]
                heatmap = cams[j]
                overlay = self.heatmap_overlay(orig, heatmap)
                if save:
                    visualize_heatmap(orig, overlay, str(row["Frame Path"]),
                                      int(row["Class"]), probs[j],
                                      self.classes,
                                      dir_path=self.save_img_dir)
        return heatmap

    def get_heatmap_for_frame(self, frame_path: str,
                              frame_df: Optional[pd.DataFrame] = None):
        """Explain a single named frame (the reference pops a tkinter file
        dialog, gradcam.py:94-111; headless here: pass the filename)."""
        if frame_df is None:
            frame_df = pd.read_csv(self.cfg["PATHS"]["FRAME_TABLE"])
        filtered = frame_df[frame_df["Frame Path"]
                            == os.path.basename(frame_path)]
        filtered = filtered.reset_index(drop=True)
        if not len(filtered):
            raise FileNotFoundError(
                f"frame {frame_path!r} not found in frame table")
        return self.apply_gradcam(filtered)
