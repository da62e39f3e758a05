"""Ultrasound-beam auto-masking (reference ``src/data/auto_masking.py``).

Scrubs raw clips of on-screen information extraneous to the ultrasound beam:
a U-Net predicts beam-probability masks on a sample of frames, morphology
cleans them, a majority vote forms the clip mask, and every frame is masked
(optionally cropped to the beam bounding box).

Reference behavior preserved (auto_masking.py:28-106): sample every
``max(floor(10%), 1)``-th frame, grayscale + skimage-exact anti-aliased
downsample to 128x128 (Gaussian pre-blur at scikit-image 0.19.1's default
sigma, then half-pixel bilinear) + /255, threshold 0.4, bilinear upsample
of the binary mask to native resolution (support = any touched pixel, cv2
INTER_LINEAR + THRESH_BINARY semantics), elliptical erode with the
edge-preserve kernel then dilate with the 5%-height smoothing kernel,
5x5-smoothed majority average, bounding-box crop, jpg or mp4 output plus a
``mask.jpg`` per clip.

TPU-native redesign: the reference runs ``model.predict`` one frame at a
time and all morphology on host cv2. Here the sampled frames run as ONE
batched U-Net forward and the threshold/morphology/majority chain is a
single jitted program (``ops.morphology`` — morphology as MXU convolutions).
Video file IO stays on host (cv2, deferred import: see the cv2/XLA
import-order note).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional, Tuple

import numpy as np

from ab_line_classifier_tpu.models.unet import UNet
from ab_line_classifier_tpu.ops import morphology as M

logging.basicConfig(format="[%(levelname)s] %(message)s", level=logging.INFO)

UNET_INPUT = (128, 128)


class UnetSegmentation:
    """Reference ``UnetSegmentation`` with a batched, jitted compute path."""

    def __init__(self, model_path: Optional[str] = None,
                 base_filters: int = 16):
        # cv2 must be imported BEFORE any jax computation runs in this
        # process (container OpenMP/XLA clash deadlocks otherwise), and
        # __init__ below runs jax (model init / checkpoint restore) — so the
        # ETL's cv2 import happens here, first.
        import cv2  # noqa: F401
        import jax

        self.model = UNet(base_filters=base_filters)
        self.variables = self.model.init(
            jax.random.PRNGKey(0),
            np.zeros((1,) + UNET_INPUT + (1,), np.float32))
        self.loaded = False
        if model_path:
            self.load(model_path)
        self._predict = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False))

    def load(self, model_path: str) -> None:
        """Restore U-Net weights: an Orbax checkpoint dir or a Keras
        ``.h5`` (the reference's pretrained format, auto_masking.py:28-29;
        imported position+shape matched, see models/unet.py). A path that
        exists but cannot be loaded RAISES — masking a medical dataset
        with silently random weights is never acceptable."""
        if os.path.isdir(model_path):
            from ab_line_classifier_tpu.utils import checkpoint as ckpt
            self.variables, _ = ckpt.load_model(model_path)
        elif os.path.isfile(model_path) and model_path.endswith(
                (".h5", ".hdf5")):
            from ab_line_classifier_tpu.models.unet import (
                import_h5_unet_weights)
            self.variables = import_h5_unet_weights(model_path,
                                                    self.variables)
        else:
            raise FileNotFoundError(
                f"automask model {model_path!r} is neither a checkpoint "
                f"directory nor a .h5 file")
        self.loaded = True

    def get_bounding_box(self, binary_mask: np.ndarray):
        """[min_i, max_i, min_j, max_j] (reference auto_masking.py:24-26)."""
        return list(M.bounding_box(binary_mask))

    # ------------------------------------------------------------------
    def predict_masks(self, frames_u8: np.ndarray) -> np.ndarray:
        """uint8 [B, H, W, 3] (or [B, H, W]) frames -> [B, 128, 128] beam
        probabilities: grayscale, then the reference's exact skimage
        downsample — Gaussian anti-aliasing blur (sigma = (factor-1)/2 per
        axis, scikit-image 0.19.1 defaults) followed by half-pixel bilinear
        interpolation (``ndi.zoom(order=1, grid_mode=True)``) — then /255
        and the batched U-Net (reference auto_masking.py:58-76;
        golden-tested against scipy.ndimage in tests/test_etl.py)."""
        import jax.numpy as jnp

        from ab_line_classifier_tpu.ops.image import skimage_downsample

        x = np.asarray(frames_u8)
        if x.ndim == 4:
            # cv2 BGR2GRAY weights on RGB input ordering
            x = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                 + 0.114 * x[..., 2])
        x = skimage_downsample(jnp.asarray(x.astype(np.float32)),
                               UNET_INPUT) / 255.0
        probs = self._predict(self.variables, x[..., None])
        return np.asarray(probs)[..., 0]

    def clip_mask(self, sampled_frames_u8: np.ndarray,
                  native_hw: Tuple[int, int],
                  edge_preserve: float = 0.95
                  ) -> Tuple[np.ndarray, list]:
        """Compute the clip-level binary mask + bounding box from sampled
        frames (the whole reference per-clip loop, auto_masking.py:63-91,
        batched)."""
        import jax
        import jax.numpy as jnp

        h, w = native_hw
        probs = self.predict_masks(sampled_frames_u8)
        # Reference chain (auto_masking.py:76-83): threshold at 0.4 on the
        # 128x128 grid, cv2.resize the BINARY mask with INTER_LINEAR to
        # native resolution, morphology, then THRESH_BINARY > 0 — so every
        # pixel the bilinear interpolation touches joins the support (a
        # border band of ~native/128 px that nearest-index upsampling
        # would drop, systematically tightening every mask). Grayscale
        # erode/dilate followed by >0 equals binary erode/dilate of that
        # support, so the support is binarized first here.
        binary128 = (probs > 0.4).astype(np.float32)
        up = jax.image.resize(jnp.asarray(binary128),
                              (binary128.shape[0], h, w), method="linear")
        support = (up > 0).astype(jnp.float32)

        kernel_size_s = max(int(h * (1 - edge_preserve)), 3)
        kernel_size_b = max(int(h * 0.05), 3)
        cleaned = M.clean_binary_masks(support,
                                       erode_size=kernel_size_s,
                                       dilate_size=kernel_size_b)
        avg = np.asarray(M.majority_average_mask(cleaned))
        return avg, self.get_bounding_box(avg)

    # ------------------------------------------------------------------
    def mask_frames(self, frames_u8: np.ndarray, mask: np.ndarray,
                    bbox: Optional[list] = None) -> np.ndarray:
        """Apply a clip mask to all frames (+ optional ROI crop)."""
        out = frames_u8 * mask.astype(frames_u8.dtype)[None, :, :, None]
        if bbox is not None:
            out = out[:, bbox[0]:bbox[1], bbox[2]:bbox[3]]
        return out

    def predict(self, input_paths: str, output_path: str,
                model_path: Optional[str] = None, output_format: str = "jpg",
                edge_preserve: float = 0.95,
                save_cropped_roi: bool = False) -> None:
        """Reference CLI surface (auto_masking.py:28-106): walk mp4s under
        ``input_paths``, write masked jpgs/mp4 + ``mask.jpg`` per clip.
        ``model_path`` (the reference API passes it here, not at
        construction) loads that model before masking.

        Memory discipline for the 1-CPU host: only the ~10% sampled frames
        are held for the batched U-Net pass; masking + writing then streams
        the clip frame-by-frame (like the reference), so peak RAM is one
        frame + the samples, not 3x the decoded clip."""
        import cv2

        if model_path:
            self.load(model_path)
        if not self.loaded:
            # Warned here, not at construction: the model legitimately
            # arrives via this call's model_path (the reference API shape).
            logging.warning("no automask model loaded; using random init "
                            "(masks will be meaningless until trained)")

        video_files = glob.glob(input_paths + "/**/*.mp4", recursive=True)
        os.makedirs(output_path, exist_ok=True)
        os.makedirs(os.path.join(output_path, "bad_clips"), exist_ok=True)
        for clip_index, file in enumerate(video_files):
            tail = os.path.basename(file)
            out_dir = os.path.join(output_path, tail[:-4])
            os.makedirs(out_dir, exist_ok=True)

            cap = cv2.VideoCapture(file)
            num_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            fw = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            fh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            fps = float(cap.get(cv2.CAP_PROP_FPS))

            # Pass 1: stream-decode, keeping every step-th frame for the
            # U-Net sample (reference samples 10%, auto_masking.py:55,63).
            # Count frames while reading — container metadata can be wrong.
            sampled = []
            step = max(int(num_frames * 0.1), 1) if num_frames > 0 else 10
            idx = 0
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                if idx == 0:
                    # Width/height metadata can be wrong just like the
                    # frame count — trust the decoded pixels, or pass-2's
                    # frame*mask broadcast dies mid-ETL on a corrupt clip.
                    fh, fw = frame.shape[:2]
                if idx % step == 0:
                    sampled.append(frame[..., ::-1].copy())
                idx += 1
            cap.release()
            if not np.isfinite(fps) or fps <= 0:
                fps = 30.0  # corrupt FPS metadata would emit an unplayable mp4
            if not sampled:
                logging.warning("no frames in %s", file)
                continue
            mask, bbox = self.clip_mask(np.stack(sampled), (fh, fw),
                                        edge_preserve=edge_preserve)
            del sampled
            crop = (bbox if (save_cropped_roi and output_format == "jpg")
                    else None)
            mask_u8 = mask.astype(np.uint8)[:, :, None]

            # Pass 2: stream mask-and-write (frame at a time).
            cap = cv2.VideoCapture(file)
            video = None
            if output_format == "mp4":
                video = cv2.VideoWriter(
                    os.path.join(out_dir, tail[:-4] + ".mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), fps, (fw, fh), True)
            i = 0
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                fr = frame * mask_u8  # BGR throughout pass 2
                if crop is not None:
                    fr = fr[crop[0]:crop[1], crop[2]:crop[3]]
                if output_format == "jpg":
                    cv2.imwrite(os.path.join(out_dir, f"{i}.jpg"), fr)
                elif video is not None:
                    video.write(np.ascontiguousarray(fr))
                i += 1
            cap.release()
            if video is not None:
                video.release()
            cv2.imwrite(os.path.join(out_dir, "mask.jpg"),
                        (mask * 255).astype(np.uint8))
            logging.info("masked clip %d/%d: %s", clip_index + 1,
                         len(video_files), tail)


def main():  # argparse CLI parity (auto_masking.py:110-137)
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input_path", required=True)
    ap.add_argument("-o", "--output_path", required=True)
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-f", "--output_format", required=True)
    ap.add_argument("-e", "--edge_preserve", type=float, default=0.95)
    ap.add_argument("-c", "--save_cropped_roi", action="store_true")
    args = ap.parse_args()
    if not 0.0 <= args.edge_preserve <= 1.0:
        raise ValueError("edge_preserve has to be in [0 1]")
    # model_path goes to predict only (the reference's load site) — the
    # constructor would import the same weights a second time.
    seg = UnetSegmentation()
    seg.predict(args.input_path, args.output_path, args.model_path,
                output_format=args.output_format,
                edge_preserve=args.edge_preserve,
                save_cropped_roi=args.save_cropped_roi)


if __name__ == "__main__":
    main()
