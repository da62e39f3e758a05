"""Inference: frame predictions, clip predictions, metrics/CSV contracts.

Reference semantics preserved (``src/predict.py``):

* ``restore_model`` loads a serialized checkpoint by path (reference :39-51;
  ours are Orbax dirs with self-describing metadata instead of .h5).
* Frame classification threshold: B-line probability >= threshold -> class 1
  (reference :82-86 via the class-index map round-trip).
* ``compute_clip_predictions`` / ``compute_frame_predictions`` write the same
  metrics-JSON and predictions-CSV shapes into ``results/metrics`` /
  ``results/predictions`` with timestamped names (reference :173-188,
  :210-222).
* Frames belong to a clip by clip-name substring match on ``Frame Path``
  (reference :152).

TPU-native redesign of the hot path: the reference rebuilds a tf.data
pipeline and calls ``model.predict`` *per clip* (reference :148-156). Here
every frame in the dataset is pushed through ONE batched device sweep
(static-shape chunks, bf16 compute), and all clips aggregate **on device** in
a single compiled call over a padded ``[n_clips, max_frames, C]`` tensor
(``ops.clip_aggregation``) — the north-star "one batched device loop over all
frames of a clip".
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ab_line_classifier_tpu.config import Config
from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.models.common import ModelSpec
from ab_line_classifier_tpu.ops import clip_aggregation as agg
from ab_line_classifier_tpu.ops.image import fused_preprocess
from ab_line_classifier_tpu.predict.metrics import compute_metrics
from ab_line_classifier_tpu.utils import checkpoint as ckpt

FRAME_PATH = "Frame Path"


def _timestamp() -> str:
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def load_class_idx_map(cfg: Config) -> Dict[str, int]:
    """Class name -> probability-column index.

    Accepts JSON or the reference's pickled dict (reference predict.py:31
    loads a dill-pickled ``{class: idx}``; plain pickle reads those), so a
    config ported from the reference keeps its serialized map. An existing
    file that parses as neither raises instead of silently substituting
    config order — a mismatched map would swap probability columns.

    The map's contract is to describe the model's probability-column order,
    which is DATA.CLASSES order at training time; a file that disagrees
    with the config (e.g. a legacy ``{'b_lines': 0}``) would make both the
    thresholded column read and the prediction labels wrong — in the
    reference too (predict.py:82-86). That near-certain misconfiguration
    warns loudly here instead of silently inverting predictions."""
    path = cfg["PATHS"].get("CLASS_NAME_MAP", "")
    if path and os.path.isfile(path):
        if path.endswith(".json"):
            with open(path) as f:
                m = {str(k): int(v) for k, v in json.load(f).items()}
        else:
            try:
                import pickle
                with open(path, "rb") as f:
                    m = {str(k): int(v)
                         for k, v in pickle.load(f).items()}
            except Exception as e:
                raise ValueError(
                    f"PATHS.CLASS_NAME_MAP {path!r} exists but is neither "
                    f"JSON nor a pickled class->index dict: {e}") from e
        config_order = {c: i for i, c in enumerate(cfg.classes)}
        if m != config_order:
            import warnings
            warnings.warn(
                f"PATHS.CLASS_NAME_MAP {path!r} ({m}) disagrees with "
                f"DATA.CLASSES order ({config_order}); the model's "
                f"probability columns follow DATA.CLASSES at training "
                f"time, so predictions read through this map are likely "
                f"inverted/mislabeled", UserWarning)
        return m
    return {c: i for i, c in enumerate(cfg.classes)}


class Predictor:
    """A restored model bound to a jitted batched forward pass.

    With ``mesh``, serving is data-parallel over EVERY mesh device:
    parameters replicate, each static-shape chunk shards over the flattened
    (trial x data) axes, and XLA inserts the ICI collectives — the reference
    has no distributed inference at all (SURVEY §2 parallelism census)."""

    def __init__(self, spec: ModelSpec, variables: Dict, *,
                 batch_size: int = 64, compute_dtype=jnp.bfloat16,
                 mesh=None):
        self.spec = spec
        self.mesh = mesh
        if mesh is not None:
            from ab_line_classifier_tpu.parallel import mesh as mesh_lib

            n_dev = int(np.prod(mesh.devices.shape))
            # static chunk shape must divide evenly over the devices
            batch_size = -(-batch_size // n_dev) * n_dev
            variables = jax.device_put(variables, mesh_lib.replicated(mesh))
            self._batch_sharding = mesh_lib.full_batch_sharding(mesh)
        else:
            self._batch_sharding = None
        self.variables = variables
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        module = spec.module()

        def forward(variables, frames_u8):
            x = fused_preprocess(
                frames_u8, out_hw=tuple(spec.input_shape[:2]),
                preprocess_mode=spec.preprocess_mode,
                out_dtype=compute_dtype)
            return module.apply(variables, x, train=False).astype(jnp.float32)

        # un-jitted serving forward, exposed so compile checks
        # (__graft_entry__.entry) point at the REAL serving computation
        self.forward = forward
        self._forward = jax.jit(forward)

    def _put_chunk(self, chunk):
        arr = jnp.asarray(chunk)
        if self._batch_sharding is not None:
            arr = jax.device_put(arr, self._batch_sharding)
        return arr

    @classmethod
    def restore(cls, model_path: str, *, batch_size: int = 64,
                compute_dtype=jnp.bfloat16, mesh=None,
                cfg: Optional[Config] = None) -> "Predictor":
        """``restore_model`` equivalent (reference predict.py:39-51).

        Native checkpoints are self-describing Orbax dirs. A ``.h5`` path (a
        reference-produced Keras checkpoint) is also accepted when ``cfg``
        supplies the architecture (TRAIN.MODEL_DEF + HPARAMS): the model is
        rebuilt and weights imported by layer name. ``.onnx`` (the
        reference's other serving format, reference predict.py:39-51) is
        restored the same way via the runtime-free protobuf weight importer
        (``models/onnx_weights.py``) — the model then serves on the normal
        jitted TPU path instead of the reference's per-frame onnx-tf loop.
        """
        if model_path.endswith(".onnx"):
            if cfg is None:
                raise ValueError(
                    ".onnx restore needs cfg to rebuild the architecture "
                    "(TRAIN.MODEL_DEF + HPARAMS)")
            from ab_line_classifier_tpu.models.onnx_weights import (
                import_onnx_weights)

            spec = build_model(cfg.model_name, cfg.model_hparams(),
                               cfg.img_dim + (3,), cfg.n_classes)
            variables = spec.init_variables(jax.random.PRNGKey(0))
            variables, copied = import_onnx_weights(
                model_path, variables, graph=spec.graph, verbose=False)
            if copied == 0:
                raise ValueError(
                    f"no layers matched while importing {model_path!r}")
            return cls(spec, variables, batch_size=batch_size,
                       compute_dtype=compute_dtype, mesh=mesh)
        if model_path.endswith(".h5"):
            if cfg is None:
                raise ValueError(
                    ".h5 restore needs cfg to rebuild the architecture "
                    "(TRAIN.MODEL_DEF + HPARAMS)")
            from ab_line_classifier_tpu.models.weights import import_h5_weights

            spec = build_model(cfg.model_name, cfg.model_hparams(),
                               cfg.img_dim + (3,), cfg.n_classes)
            variables = spec.init_variables(jax.random.PRNGKey(0))
            variables, copied = import_h5_weights(model_path, variables,
                                                  verbose=False,
                                                  graph=spec.graph)
            if copied == 0:
                raise ValueError(
                    f"no layers matched while importing {model_path!r}")
            return cls(spec, variables, batch_size=batch_size,
                       compute_dtype=compute_dtype, mesh=mesh)
        variables, meta = ckpt.load_model(model_path)
        spec = build_model(meta["model_name"], meta["hparams"],
                           tuple(meta["input_shape"]), int(meta["n_classes"]),
                           mixed_precision=bool(meta.get("mixed_precision",
                                                         False)))
        return cls(spec, variables, batch_size=batch_size,
                   compute_dtype=compute_dtype, mesh=mesh)

    # ------------------------------------------------------------------
    def predict_probs(self, frames_u8: np.ndarray) -> np.ndarray:
        """Probabilities for a uint8 [N, H, W, 3] frame array, swept in
        static-shape chunks, pipelined one chunk deep
        (``pipeline.drain_behind``): chunk k+1's host->device transfer and
        dispatch are issued BEFORE chunk k's probabilities are
        materialized (np.asarray blocks until the forward finishes —
        materializing eagerly would serialize transfer, compute, and
        readback per chunk; measured +12% on the real chip,
        docs/PERFORMANCE.md #4)."""
        from ab_line_classifier_tpu.data.pipeline import drain_behind

        n = len(frames_u8)
        bs = self.batch_size
        out = np.zeros((n, self.spec.n_classes), np.float32)

        def launch(i):
            chunk = frames_u8[i:i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            return (i, self._forward(self.variables,
                                     self._put_chunk(chunk)), pad)

        def drain(pending):
            j, dev, pad = pending
            out[j:j + bs] = np.asarray(dev)[: bs - pad]

        drain_behind((launch(i) for i in range(0, n, bs)), drain)
        return out

    def predict_dataset(self, ds: FrameDataset) -> np.ndarray:
        """Decode + predict a frames table: host decode (producer thread),
        host->device transfer, device forward, and host readback all
        pipeline via ``pipeline.drain_behind`` (see predict_probs)."""
        from ab_line_classifier_tpu.data.pipeline import drain_behind

        out = np.zeros((len(ds), self.spec.n_classes), np.float32)

        def launch(batch):
            return (self._forward(self.variables,
                                  self._put_chunk(batch.images)),
                    batch.indices, batch.mask)

        def drain(pending):
            dev, indices, mask = pending
            probs = np.asarray(dev)
            valid = mask > 0
            out[indices[valid]] = probs[valid]

        drain_behind((launch(b) for b in ds.batches(self.batch_size)),
                     drain)
        return out


def default_predictor(cfg: Config) -> Predictor:
    """The restore every predict surface shares (``PATHS.MODEL_TO_LOAD``
    checkpoint dir or ``.onnx``, config batch size, mesh from PARALLEL) —
    one definition so the CLI and both compute_* functions cannot drift."""
    from ab_line_classifier_tpu.parallel.mesh import mesh_from_config

    return Predictor.restore(cfg["PATHS"]["MODEL_TO_LOAD"],
                             batch_size=cfg.batch_size, cfg=cfg,
                             mesh=mesh_from_config(cfg))


def classify_probs(probs: np.ndarray, cfg: Config,
                   threshold: float = 0.5) -> List[int]:
    """Threshold b_lines probability -> predicted class ids in DATA.CLASSES
    order via the serialized class-index map (reference predict.py:73-76)."""
    idx_map = load_class_idx_map(cfg)
    preds = (probs[:, idx_map["b_lines"]] >= threshold).astype(int)
    idx_class = {v: k for k, v in idx_map.items()}
    classes = cfg.classes
    return [classes.index(idx_class[int(p)]) for p in preds]


def predict_set(predictor: Predictor, frames_df: pd.DataFrame,
                frames_dir: str, cfg: Config,
                threshold: float = 0.5) -> Tuple[List[int], np.ndarray]:
    """Reference ``predict_set`` (predict.py:54-87): returns (predicted class
    ids in DATA.CLASSES order, probability array)."""
    ds = FrameDataset(frames_df, frames_dir, img_dim=cfg.img_dim)
    probs = predictor.predict_dataset(ds)
    return classify_probs(probs, cfg, threshold), probs


# ----------------------------------------------------------------------
def group_clip_probs(frames_df: pd.DataFrame, probs: np.ndarray,
                     clip_names: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-frame probs into a padded [n_clips, max_frames, C] tensor +
    mask, grouping frames by clip-name substring match (reference
    predict.py:152), frames in table order."""
    paths = frames_df[FRAME_PATH].astype(str)
    groups = []
    for clip_name in clip_names:
        idx = np.nonzero(paths.str.contains(clip_name, regex=False).to_numpy())[0]
        groups.append(idx)
    # A clip with zero matching frames is a frames/clips table mismatch
    # (typo, extension mismatch, wrong FRAME_TABLE): aggregating its
    # all-padding row would silently score it as a confident negative
    # (average -> [0,0]; contiguous/sliding_window -> a_lines) and the
    # corruption would be invisible in the metrics. Fail loudly instead.
    empty = [n for n, g in zip(clip_names, groups) if len(g) == 0]
    if empty:
        shown = ", ".join(map(repr, empty[:5]))
        raise ValueError(
            f"{len(empty)} clip(s) in the clips table match no rows of the "
            f"frames table (first: {shown}) — check that FRAME_TABLE and "
            f"CLIPS_TABLE describe the same dataset")
    max_frames = max((len(g) for g in groups), default=1) or 1
    n_clips = len(clip_names)
    c = probs.shape[1]
    padded = np.zeros((n_clips, max_frames, c), np.float32)
    mask = np.zeros((n_clips, max_frames), np.float32)
    for i, g in enumerate(groups):
        padded[i, :len(g)] = probs[g]
        mask[i, :len(g)] = 1.0
    return padded, mask


def compute_clip_predictions(cfg: Config, frames_table_path: str,
                             clips_table_path: str, class_thresh: float = 0.5,
                             clip_algorithm: str = "contiguous",
                             calculate_metrics: bool = True,
                             predictor: Optional[Predictor] = None,
                             frames_dir: Optional[str] = None,
                             frame_probs: Optional[np.ndarray] = None
                             ) -> pd.DataFrame:
    """Reference ``compute_clip_predictions`` (predict.py:125-188), as one
    batched device sweep + one compiled aggregation call.

    ``frame_probs`` (rows aligned with the frames table) skips the sweep —
    the CLI computes one sweep and feeds both the clip and frame passes.
    """
    if predictor is None:
        predictor = default_predictor(cfg)
    frames_dir = frames_dir or cfg["PATHS"]["FRAMES"]
    set_name = os.path.basename(frames_table_path).split(".")[0] + "_clips"

    frames_df = pd.read_csv(frames_table_path)
    clips_df = pd.read_csv(clips_table_path)
    clip_names = clips_df["filename"].astype(str).tolist()
    print(f"Found {len(clip_names)} clips. Determining clip predictions "
          f"with {clip_algorithm} algorithm.")

    # ONE sweep over every frame, then one compiled aggregation.
    if frame_probs is None:
        ds = FrameDataset(frames_df, frames_dir, img_dim=cfg.img_dim)
        frame_probs = predictor.predict_dataset(ds)
    padded, mask = group_clip_probs(frames_df, frame_probs, clip_names)
    clip_probs = np.asarray(agg.aggregate_clips(
        jnp.asarray(padded), jnp.asarray(mask), algorithm=clip_algorithm,
        classification_threshold=class_thresh,
        contiguity_threshold=int(cfg["CLIP_PREDICTION"]["CONTIGUITY_THRESHOLD"]),
        window=int(cfg["CLIP_PREDICTION"]["SLIDING_WINDOW"])))

    idx_map = load_class_idx_map(cfg)
    clip_pred_classes = (clip_probs[:, idx_map["b_lines"]]
                         >= class_thresh).astype(int)

    if calculate_metrics:
        clip_labels = clips_df["class"].to_numpy()
        # The reference skips AUC for the contiguous algorithm's hard
        # pseudo-probabilities (predict.py:175-178).
        probs_arg = None if clip_algorithm == "contiguous" else clip_probs
        metrics = compute_metrics(cfg.classes, clip_labels, clip_pred_classes,
                                  probs_arg, idx_map)
        out = os.path.join(cfg["PATHS"]["METRICS"],
                           f"clips_{set_name}{_timestamp()}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(metrics, f)

    pred_probs_df = pd.DataFrame(clip_probs, columns=cfg.classes)
    pred_probs_df.insert(0, "filename", clips_df["filename"])
    if "class" in clips_df.columns:  # absent on unlabeled tables
        pred_probs_df.insert(1, "class", clips_df["class"])
    os.makedirs(cfg["PATHS"]["BATCH_PREDS"], exist_ok=True)
    pred_probs_df.to_csv(os.path.join(
        cfg["PATHS"]["BATCH_PREDS"],
        f"{set_name}_predictions{_timestamp()}.csv"))
    return pred_probs_df


def compute_frame_predictions(cfg: Config, dataset_files_path: str,
                              class_thresh: float = 0.5,
                              calculate_metrics: bool = True,
                              predictor: Optional[Predictor] = None,
                              frames_dir: Optional[str] = None,
                              frame_probs: Optional[np.ndarray] = None
                              ) -> pd.DataFrame:
    """Reference ``compute_frame_predictions`` (predict.py:191-222).

    ``frame_probs`` (rows aligned with the frames table) skips the sweep —
    see :func:`compute_clip_predictions`.
    """
    if predictor is None:
        predictor = default_predictor(cfg)
    frames_dir = frames_dir or cfg["PATHS"]["FRAMES"]
    set_name = os.path.basename(dataset_files_path).split(".")[0] + "_frames"

    files_df = pd.read_csv(dataset_files_path)
    if frame_probs is None:
        pred_classes, pred_probs = predict_set(
            predictor, files_df, frames_dir, cfg, threshold=class_thresh)
    else:
        pred_probs = frame_probs
        pred_classes = classify_probs(pred_probs, cfg, class_thresh)

    if calculate_metrics:
        frame_labels = files_df["Class"].to_numpy()
        metrics = compute_metrics(cfg.classes, frame_labels,
                                  np.asarray(pred_classes), pred_probs,
                                  load_class_idx_map(cfg))
        # set_name carries the frames-table stem so runs over different
        # tables (e.g. predict --ext-val) write distinguishable files —
        # the reference omits the stem from the frame pass
        # (predict.py:204,220), making an ext-val run's outputs
        # indistinguishable from the in-distribution run's except by
        # mtime (fixed latent quirk; symmetric with the clip pass).
        out = os.path.join(cfg["PATHS"]["METRICS"],
                           f"frames_{set_name}{_timestamp()}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(metrics, f)

    pred_probs_df = pd.DataFrame(pred_probs, columns=cfg.classes)
    pred_probs_df.insert(0, FRAME_PATH, files_df[FRAME_PATH])
    if "Class" in files_df.columns:  # absent on unlabeled tables
        pred_probs_df.insert(1, "Class", files_df["Class"])
    os.makedirs(cfg["PATHS"]["BATCH_PREDS"], exist_ok=True)
    pred_probs_df.to_csv(os.path.join(
        cfg["PATHS"]["BATCH_PREDS"],
        f"{set_name}_predictions{_timestamp()}.csv"))
    return pred_probs_df
