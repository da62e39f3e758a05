"""Per-epoch evaluation callbacks.

The reference's ``WandbGradcamEvalCallback`` (reference
``src/train_utils.py:238-293``) logs a validation prediction table every
epoch — running single-image inference in an eager Python loop (the
training loop's secondary hot loop). Here the same capability is a batched
device sweep with an optional fused Grad-CAM pass, logging through the
pluggable tracker:

* a per-epoch table ``epoch, idx, frame, label, probs, pred`` (CSV per epoch
  under the run directory, mirroring the W&B table columns), and
* optional Grad-CAM heatmap PNGs for the first ``n_heatmaps`` rows.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


class PredictionTableLogger:
    """Batched per-epoch val-set prediction logging (the reference callback's
    capability without the per-image eager loop)."""

    def __init__(self, spec, val_ds, *, tracker=None, max_rows: int = 64,
                 n_heatmaps: int = 0, heatmap_dir: Optional[str] = None,
                 compute_dtype=jnp.float32):
        self.spec = spec
        self.val_ds = val_ds
        self.tracker = tracker
        self.max_rows = max_rows
        self.n_heatmaps = n_heatmaps
        self.heatmap_dir = heatmap_dir
        self.compute_dtype = compute_dtype
        self._forward = None
        self._gradcam = None

    def _ensure_forward(self):
        if self._forward is not None:
            return
        from ab_line_classifier_tpu.models.preprocess import get_preprocess_fn

        module = self.spec.module()
        prep = get_preprocess_fn(self.spec.preprocess_mode)

        def forward(variables, images_u8):
            x = prep(images_u8.astype(jnp.float32)).astype(self.compute_dtype)
            return module.apply(variables, x, train=False).astype(jnp.float32)

        self._forward = jax.jit(forward)

    def on_epoch_end(self, epoch: int, variables) -> pd.DataFrame:
        self._ensure_forward()
        rows = []
        heat_frames = []
        n = 0
        for batch in self.val_ds.batches(min(64, max(1, self.max_rows))):
            probs = np.asarray(self._forward(variables,
                                             jnp.asarray(batch.images)))
            for j in np.nonzero(batch.mask > 0)[0]:
                idx = int(batch.indices[j])
                frame = str(self.val_ds.df.iloc[idx]["Frame Path"])
                rows.append({
                    "epoch": epoch, "idx": idx, "frame": frame,
                    "label": int(batch.labels[j]),
                    "probs": probs[j].round(5).tolist(),
                    "pred": int(np.argmax(probs[j])),
                })
                if len(heat_frames) < self.n_heatmaps:
                    heat_frames.append((frame, batch.images[j],
                                        int(batch.labels[j]), probs[j]))
                n += 1
                if n >= self.max_rows:
                    break
            if n >= self.max_rows:
                break
        table = pd.DataFrame(rows)

        run_dir = getattr(self.tracker, "run_dir", None)
        if run_dir:
            out = os.path.join(run_dir, "val_predictions")
            os.makedirs(out, exist_ok=True)
            table.to_csv(os.path.join(out, f"epoch_{epoch:03d}.csv"),
                         index=False)

        if heat_frames and self.heatmap_dir:
            from ab_line_classifier_tpu.explain.gradcam import (
                build_fused_gradcam, heatmap_overlay)
            from ab_line_classifier_tpu.viz.visualization import (
                visualize_heatmap)

            if self._gradcam is None:
                # Frames from the dataset are already at model resolution,
                # so the prep is just the model's normalization.
                from ab_line_classifier_tpu.models.preprocess import (
                    get_preprocess_fn)
                prep = get_preprocess_fn(self.spec.preprocess_mode)
                self._gradcam = build_fused_gradcam(
                    self.spec,
                    prep_fn=lambda u8: prep(u8.astype(jnp.float32)))
            images = np.stack([im for _, im, _, _ in heat_frames])
            _, cams = self._gradcam(variables, jnp.asarray(images))
            cams = np.asarray(cams)
            for k, (frame, im, label, probs) in enumerate(heat_frames):
                overlay = heatmap_overlay(im, cams[k])
                # visualize_heatmap keeps only the basename of the name it
                # is given — tag epoch + row index there so heatmaps from
                # same-named frames / consecutive epochs don't collide.
                name = f"epoch{epoch:03d}_{k}_{os.path.basename(frame)}"
                visualize_heatmap(im, overlay, name, label, probs,
                                  [str(i) for i in range(len(probs))],
                                  dir_path=self.heatmap_dir)
        return table
