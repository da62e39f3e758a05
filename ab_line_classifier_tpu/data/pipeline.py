"""Host-side input pipeline: frames CSV -> decoded uint8 batches -> device.

Replaces the reference's tf.data pipeline (reference
``src/data/preprocessor.py:36-80``) with an explicit, dependency-free loader:

* **Host** (this module): CSV table -> JPEG decode (PIL; cv2 deadlocks
  against XLA in this environment) -> nearest-neighbor resize to IMG_DIM with
  the same index map as the device kernel -> static-shape uint8 batches with
  a validity mask (partial final batch is padded, never dynamically shaped —
  XLA recompiles on shape changes, masks are free) -> background-thread
  prefetch pipelined with device compute.
* **Device** (``ops.preprocess_pallas`` / ``ops.image``): normalization (and
  resize, when frames arrive at native resolution), augmentation, model.

The host stays intentionally thin: one CPU feeds the chip, so all per-pixel
math beyond decode lives on the TPU.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from PIL import Image

from ab_line_classifier_tpu.ops.image import nearest_indices

FRAME_PATH = "Frame Path"
CLASS = "Class"


@dataclass
class Batch:
    """A static-shape host batch."""

    images: np.ndarray   # uint8 [B, H, W, 3]
    labels: np.ndarray   # int32 [B]
    mask: np.ndarray     # float32 [B]; 0 marks padding rows
    indices: np.ndarray  # int32 [B] row indices into the source table (-1 pad)


def decode_jpeg(path: str) -> np.ndarray:
    """Decode one image file to uint8 RGB HWC."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _resize_nearest_np(img: np.ndarray, out_hw: Tuple[int, int],
                       mode: str = "tf") -> np.ndarray:
    h, w = img.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    ridx = nearest_indices(h, oh, mode)
    cidx = nearest_indices(w, ow, mode)
    return img[ridx][:, cidx]


class FrameDataset:
    """A frames table bound to an image directory.

    Expects the reference's frames-table schema (columns ``Frame Path``,
    ``Class``, and optionally ``patient_id`` / ``Class Name`` / ``id``,
    reference ``src/data/ab_line_dataset_creator.py:70-72``).
    """

    def __init__(self, frames_df: pd.DataFrame, frames_dir: str,
                 img_dim: Tuple[int, int] = (128, 128),
                 resize_mode: str = "tf", use_native: Optional[bool] = None):
        self.df = frames_df.reset_index(drop=True)
        self.frames_dir = frames_dir
        self.img_dim = tuple(img_dim)
        self.resize_mode = resize_mode
        if use_native is None:
            from ab_line_classifier_tpu.data import native
            use_native = native.native_available()
        self.use_native = use_native

    @classmethod
    def from_csv(cls, csv_path: str, frames_dir: str, **kw) -> "FrameDataset":
        return cls(pd.read_csv(csv_path), frames_dir, **kw)

    def __len__(self) -> int:
        return len(self.df)

    @property
    def labels(self) -> np.ndarray:
        # Unlabeled tables (prediction-only use, e.g. `predict
        # --no-metrics` on prospective data with no ground truth) get
        # all-zero labels: batches() threads them through but nothing
        # consumes them without metrics.
        if CLASS not in self.df.columns:
            return np.zeros(len(self.df), np.int32)
        return self.df[CLASS].to_numpy().astype(np.int32)

    @property
    def paths(self) -> Sequence[str]:
        # Cached: per-frame consumers (load_frame in the PIL decode path,
        # Grad-CAM) index this per call — rebuilding N joins per access
        # would be O(N^2) per epoch on the 1-CPU host. Keyed on the df
        # OBJECT, not its length: a same-length df swap must not serve the
        # old table's paths under the new table's labels.
        cached = getattr(self, "_paths", None)
        if cached is None or getattr(self, "_paths_df", None) is not self.df:
            cached = [os.path.join(self.frames_dir, p)
                      for p in self.df[FRAME_PATH]]
            self._paths = cached
            self._paths_df = self.df
        return cached

    def n_batches(self, batch_size: int, drop_remainder: bool = False) -> int:
        n = len(self)
        return n // batch_size if drop_remainder else -(-n // batch_size)

    def load_frame(self, row_idx: int) -> np.ndarray:
        img = decode_jpeg(self.paths[row_idx])
        return _resize_nearest_np(img, self.img_dim, self.resize_mode)

    # ------------------------------------------------------------------
    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = False,
                prefetch: int = 2) -> Iterator[Batch]:
        """Iterate static-shape batches, decoding on a background thread."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        if drop_remainder:
            order = order[: (len(order) // batch_size) * batch_size]

        all_paths = self.paths
        all_labels = self.labels  # hoisted: one pandas->numpy conversion

        def make_batch(idxs: np.ndarray, n_valid: int) -> Batch:
            # Rows >= n_valid are wraparound duplicates of the batch's OWN
            # rows (mask 0): excluded from loss/metrics, but trainable-BN
            # batch statistics see real images instead of zeros — the same
            # policy as DeviceCachedDataset and the trial-parallel index
            # tables, and far closer to Keras's ragged final batch. Only
            # the n_valid distinct rows are decoded; duplicates are
            # memcpy'd (re-decoding up to batch_size-1 wraparound JPEGs
            # per epoch would be pure host overhead on a small host).
            h, w = self.img_dim
            images = np.zeros((batch_size, h, w, 3), np.uint8)
            labels = np.zeros((batch_size,), np.int32)
            mask = np.zeros((batch_size,), np.float32)
            indices = np.full((batch_size,), -1, np.int32)
            lab = all_labels
            valid = idxs[:n_valid]
            if self.use_native:
                from ab_line_classifier_tpu.data import native
                native.decode_jpeg_batch(
                    [all_paths[int(ri)] for ri in valid], self.img_dim,
                    self.resize_mode, out=images[:n_valid])
                for j, ri in enumerate(valid):
                    labels[j] = lab[ri]
            else:
                for j, ri in enumerate(valid):
                    images[j] = self.load_frame(int(ri))
                    labels[j] = lab[ri]
            for j in range(n_valid, batch_size):
                src = (j - n_valid) % n_valid
                images[j] = images[src]
                labels[j] = labels[src]
            mask[:n_valid] = 1.0
            indices[:n_valid] = valid
            return Batch(images, labels, mask, indices)

        # Wraparound duplication for the ragged tail happens in ONE place —
        # make_batch's copy loop above; the chunks stay unpadded.
        chunks = [(order[i:i + batch_size], len(order[i:i + batch_size]))
                  for i in range(0, len(order), batch_size)]
        if prefetch <= 0:
            for c, nv in chunks:
                yield make_batch(c, nv)
            return

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that stays responsive to ``stop`` — a producer
            parked in a plain q.put() on a full queue would never observe
            an abandoned consumer and leak the thread + its batches."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for c, nv in chunks:
                    if stop.is_set():
                        return
                    if not put_or_stop(make_batch(c, nv)):
                        return
            except Exception as e:  # surface decode errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            while True:  # unblock a mid-put producer promptly
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    # ------------------------------------------------------------------
    def load_all(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decode the full dataset into one array (small-dataset eval path)."""
        h, w = self.img_dim
        if self.use_native:
            from ab_line_classifier_tpu.data import native
            images = native.decode_jpeg_batch(list(self.paths), self.img_dim,
                                              self.resize_mode)
        else:
            images = np.zeros((len(self), h, w, 3), np.uint8)
            for i in range(len(self)):
                images[i] = self.load_frame(i)
        return images, self.labels


def drain_behind(launched, consume, enabled: Optional[bool] = None) -> None:
    """One-deep host↔device pipelining, the single audited copy of the
    scheduling invariant all transfer loops share: item k+1 is LAUNCHED
    (its async ``device_put`` / dispatch issued, by pulling it from the
    ``launched`` iterator) before item k is CONSUMED (the blocking
    ``np.asarray`` / step dispatch), and the tail always flushes. Measured
    wins on the real chip: training streaming tier 3.56→3.20 s/epoch,
    host-fed serving sweep 832→932 frames/sec (docs/PERFORMANCE.md #4).

    ``enabled=None`` reads ``ABLC_DEVICE_PREFETCH`` (default on; ``0`` is
    the serial kill-switch for measurement/bisection — consume
    immediately, identical results by construction)."""
    if enabled is None:
        enabled = os.environ.get("ABLC_DEVICE_PREFETCH", "1") != "0"
    if not enabled:
        for item in launched:
            consume(item)
        return
    pending = None
    for item in launched:
        if pending is not None:
            consume(pending)
        pending = item
    if pending is not None:
        consume(pending)


def replicated_scan_gather(batch_sharding):
    """Traceable batch gather against a REPLICATED device frame store: a
    plain ``take`` per batch, re-constrained to the data-parallel batch
    sharding. The single source of the replicated-cache gather semantics —
    used by :meth:`DeviceCachedDataset.make_scan_gather` and as
    ``train/loop.py make_epoch_fns``'s fallback when the dataset is unknown
    at build time (the two must stay bit-identical: the scan-epoch ==
    ``batches()`` parity contract)."""
    import jax
    import jax.numpy as jnp

    def gather(frames, labels_d, idx, mask):
        del mask
        images = jnp.take(frames, idx, axis=0)
        lbs = jnp.take(labels_d, idx, axis=0)
        if batch_sharding is not None:  # keep batches data-parallel
            images = jax.lax.with_sharding_constraint(images, batch_sharding)
            lbs = jax.lax.with_sharding_constraint(lbs, batch_sharding)
        return images, lbs

    return gather


class DeviceCachedDataset:
    """A FrameDataset decoded ONCE and kept resident in HBM: per-epoch
    batches are device-side gathers, so after the first epoch the host does
    no decode work and no host->device pixel transfer at all.

    Exposes the same ``batches()`` surface as :class:`FrameDataset`, so the
    training loop is unchanged (its ``shard_batch`` device_put is a no-op on
    already-resident arrays). The tf.data analogue is ``.cache()``
    (reference preprocessor.py keeps everything host-side instead); on this
    backend it removes the dominant cost for datasets that fit HBM — the
    host decode + O(100 MB/s) tunnel transfer (docs/PERFORMANCE.md)."""

    def __init__(self, ds: FrameDataset, mesh=None):
        import jax
        import jax.numpy as jnp

        self.df = ds.df
        self.img_dim = ds.img_dim
        self.mesh = mesh
        images, labels = ds.load_all()
        self._n = len(ds)
        self._labels = jnp.asarray(labels.astype(np.int32))
        self._init_frames(images, mesh)
        self._gather = jax.jit(self.make_scan_gather(None))

    def _init_frames(self, images: np.ndarray, mesh) -> None:
        import jax
        import jax.numpy as jnp

        self._frames = jnp.asarray(images)
        if mesh is not None:
            # Replicate across the mesh ONCE — otherwise every epoch
            # program re-broadcasts the whole array from one device.
            from ab_line_classifier_tpu.parallel import mesh as mesh_lib
            rep = mesh_lib.replicated(mesh)
            self._frames = jax.device_put(self._frames, rep)
            self._labels = jax.device_put(self._labels, rep)

    def make_scan_gather(self, batch_sharding):
        """Staged (traceable) batch gather used both by ``batches()`` and by
        the scan-based single-program epoch (train/loop.py make_epoch_fns).
        Padded index positions hold wraparound duplicates of the epoch's own
        frames (``epoch_index_table``), matching the host pipeline: masked
        out of loss/metrics, real images in trainable-BN batch statistics."""
        return replicated_scan_gather(batch_sharding)

    def __len__(self) -> int:
        return self._n

    @property
    def labels(self) -> np.ndarray:
        return np.asarray(self._labels)

    @property
    def frames(self):
        """Device-resident uint8 frames [N, H, W, 3]."""
        return self._frames

    @property
    def labels_dev(self):
        """Device-resident int32 labels [N]."""
        return self._labels

    def n_batches(self, batch_size: int, drop_remainder: bool = False) -> int:
        return (self._n // batch_size if drop_remainder
                else -(-self._n // batch_size))

    def epoch_index_table(self, batch_size: int, *, shuffle: bool = False,
                          seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """One epoch's batches as a padded [n_batches, B] index table plus
        validity mask — the input to the scan-based single-program epoch
        (train/loop.py make_epoch_fns)."""
        order = np.arange(self._n, dtype=np.int32)
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        nb = -(-self._n // batch_size)
        pad = nb * batch_size - self._n
        # Wraparound padding cycles the FINAL batch's own rows — the same
        # indices the host pipeline duplicates (FrameDataset.batches), so
        # cached and streaming epochs stay bit-identical; see gather().
        tail = order[(nb - 1) * batch_size:]
        idx = np.concatenate([order, np.resize(tail, pad)]) if pad else order
        mask = np.concatenate([np.ones(self._n, np.float32),
                               np.zeros(pad, np.float32)])
        return (idx.reshape(nb, batch_size), mask.reshape(nb, batch_size))

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = False,
                prefetch: int = 0) -> Iterator[Batch]:
        import jax.numpy as jnp

        idx_tab, mask_tab = self.epoch_index_table(batch_size,
                                                   shuffle=shuffle, seed=seed)
        nb = idx_tab.shape[0]
        if drop_remainder and self._n % batch_size:
            nb -= 1
        for b in range(nb):
            idx, mask = idx_tab[b], mask_tab[b]
            indices = np.where(mask > 0, idx, -1).astype(np.int32)
            ims, lbs = self._gather(self._frames, self._labels,
                                    jnp.asarray(idx), jnp.asarray(mask))
            yield Batch(ims, lbs, mask, indices)


def shard_frames_over_data(images: np.ndarray, mesh):
    """Place a ``[N, ...]`` host array as ``[D, S, ...]`` with the leading
    device axis sharded over the mesh's ``data`` axis (S = ceil(N/D); zero
    rows pad the tail — they are never indexed). Returns the global sharded
    array."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ab_line_classifier_tpu.parallel import mesh as mesh_lib

    n = len(images)
    d = mesh.shape[mesh_lib.DATA_AXIS]
    s = -(-n // d)
    pad = d * s - n
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
    return jax.device_put(images.reshape((d, s) + images.shape[1:]),
                          NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))


def sharded_gather(frames, idx):
    """Gather rows ``idx`` (any int shape, values = global row numbers) from
    a ``[D, S, ...]`` data-axis-sharded frame store: D mask-selected local
    gathers + a sum over the sharded axis (XLA lowers it to ONE all-reduce
    of the gathered batch over ICI). Exactly one device owns each global
    row, so the sum — exact even in uint8 — reconstructs the batch
    bit-identically to a replicated take."""
    import jax
    import jax.numpy as jnp

    d, s = frames.shape[0], frames.shape[1]
    offsets = jnp.arange(d, dtype=jnp.int32)[:, None] * s
    flat = idx.reshape(-1).astype(jnp.int32)
    rel = flat[None, :] - offsets                            # [D, K]
    owned = (rel >= 0) & (rel < s)
    safe = jnp.where(owned, rel, 0)
    per_dev = jax.vmap(lambda f, r: jnp.take(f, r, axis=0))(
        frames, safe)                                        # [D, K, ...]
    sel = owned.astype(per_dev.dtype)
    sel = sel.reshape(sel.shape + (1,) * (per_dev.ndim - 2))
    # accumulate in the FRAME dtype: jnp.sum would promote uint8 to uint32
    # and quadruple the all-reduce bytes; exact regardless, since exactly
    # one device owns each row (all other contributions are zero).
    out = (per_dev * sel).sum(axis=0, dtype=per_dev.dtype)   # [K, ...]
    return out.reshape(tuple(idx.shape) + frames.shape[2:])


class ShardedDeviceCachedDataset(DeviceCachedDataset):
    """A device cache whose uint8 frame axis is SHARDED across the mesh's
    ``data`` axis: an N-device mesh holds N× the dataset in HBM, lifting the
    single-chip ceiling of :class:`DeviceCachedDataset` (which replicates).

    Memory model: frames are stored ``[D, S, H, W, 3]`` (S = ceil(n/D)) with
    the leading device axis sharded ``P('data')`` — each device owns one
    contiguous 1/D slice. A batch gather is expressed as D mask-selected
    local gathers followed by a sum over the sharded axis, which XLA lowers
    to one per-batch all-reduce over ICI (every global row lives on exactly
    one device, so the uint8 sum is exact). Cost per batch is O(batch) on
    the interconnect — independent of dataset size — versus the host
    streaming fallback's decode + PCIe/tunnel transfer per epoch. Batches,
    losses, and BN statistics are bit-identical to the replicated cache
    (tests/test_sharded_cache.py).

    This is the TPU-native successor to the reference's host-side tf.data
    pipeline scale story (reference ``src/data/preprocessor.py:36-66``);
    the reference has no multi-device data placement at all."""

    def __init__(self, ds: FrameDataset, mesh):
        if mesh is None:
            raise ValueError("ShardedDeviceCachedDataset requires a mesh")
        super().__init__(ds, mesh=mesh)

    def _init_frames(self, images: np.ndarray, mesh) -> None:
        import jax

        from ab_line_classifier_tpu.parallel import mesh as mesh_lib

        # Padding rows are never indexed (epoch tables stay < n).
        self._frames = shard_frames_over_data(images, mesh)
        # Labels are 4 bytes/frame — replicate them; only pixels shard.
        self._labels = jax.device_put(self._labels,
                                      mesh_lib.replicated(mesh))

    def make_scan_gather(self, batch_sharding):
        import jax
        import jax.numpy as jnp

        def gather(frames, labels_d, idx, mask):
            del mask
            images = sharded_gather(frames, idx)
            lbs = jnp.take(labels_d, idx, axis=0)
            if batch_sharding is not None:
                images = jax.lax.with_sharding_constraint(images,
                                                          batch_sharding)
                lbs = jax.lax.with_sharding_constraint(lbs, batch_sharding)
            return images, lbs

        return gather


# Fallback HBM budget for auto device-caching when the backend exposes no
# memory stats (u8 pixels only; leaves room for params/activations on a
# 16 GB chip).
DEVICE_CACHE_BYTES = 2 << 30

# Fraction of free HBM the pixel cache may claim; the rest stays for the
# model's params, optimizer state, and peak activations.
_FREE_HBM_FRACTION = 0.5


def device_cache_budget(default: int = DEVICE_CACHE_BYTES) -> int:
    """HBM budget for the device pixel cache.

    Measured when the backend reports memory stats
    (``device.memory_stats()``: half of currently-free HBM), else
    ``default``. Never below ``default`` when the device reports *more*
    free memory than 2x default — i.e. the measured path can only raise
    the ceiling on big-HBM chips and lower it under real pressure."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            return int((int(limit) - int(in_use)) * _FREE_HBM_FRACTION)
    except Exception:  # pragma: no cover - backend-dependent
        pass
    return default


def maybe_device_cache(ds: FrameDataset, mode="auto", mesh=None,
                       budget: Optional[int] = None):
    """Wrap in a device cache when enabled (True) or when 'auto' and the
    decoded pixels fit in HBM (``budget`` = measured free HBM when
    available, else :data:`DEVICE_CACHE_BYTES`, interpreted per device):

    * fits one device's budget -> :class:`DeviceCachedDataset` (replicated;
      zero-communication batch gathers);
    * exceeds one device but fits the MESH's aggregate ``data``-axis budget
      -> :class:`ShardedDeviceCachedDataset` (each device holds 1/D of the
      frames; one O(batch) all-reduce per gather);
    * exceeds the aggregate -> the host streaming pipeline.

    Callers caching several datasets (train + val) should split the budget
    between them. Falls back to the host pipeline on any failure (e.g. HBM
    pressure)."""
    if mode is False or mode is None:
        return ds
    if budget is None:
        budget = device_cache_budget()
    h, w = ds.img_dim
    nbytes = len(ds) * h * w * 3
    from ab_line_classifier_tpu.parallel import mesh as mesh_lib
    n_data = mesh.shape.get(mesh_lib.DATA_AXIS, 1) if mesh else 1
    # Tier choice applies to forced caching too: mode=True with a dataset
    # beyond one device's budget must not attempt (and OOM out of) the
    # replicated cache when the mesh's aggregate budget can hold it.
    sharded = nbytes > budget and n_data > 1
    if mode == "auto" and nbytes > budget and not (
            sharded and nbytes <= budget * n_data):
        return ds
    try:
        if sharded:
            return ShardedDeviceCachedDataset(ds, mesh=mesh)
        return DeviceCachedDataset(ds, mesh=mesh)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"(device cache disabled: {e})")
        return ds


