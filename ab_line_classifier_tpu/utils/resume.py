"""Atomic single-file mid-training checkpoints (resume support).

Used by the serial :class:`~ab_line_classifier_tpu.train.loop.Trainer` and
the SPMD :class:`~ab_line_classifier_tpu.parallel.trial_parallel.
ParallelFoldTrainer`. The reference has no mid-training checkpointing at
all (final ``.h5`` only, reference ``src/train.py:139-144``); since the
whole point of this feature is surviving interruption, the write itself
must be interruption-safe:

* arrays and host-side progress go into ONE msgpack payload (two files can
  desynchronize when a kill lands between their writes — the resumed run
  would then re-apply an epoch to post-epoch weights);
* the file is written to a temp path, fsynced, and ``os.replace``d over
  the previous checkpoint, so a kill at any moment leaves either the old
  complete checkpoint or the new one, never a truncated or mixed state.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_resume(dir_path: str, filename: str, payload: Dict[str, Any],
                progress: Dict[str, Any]) -> None:
    """Atomically persist ``payload`` (a msgpack-serializable pytree of
    numpy/jax arrays, ``None`` allowed) plus ``progress`` (JSON-able host
    state) as one file."""
    from flax import serialization

    os.makedirs(dir_path, exist_ok=True)
    blob = serialization.msgpack_serialize({
        "payload": jax.tree.map(np.asarray, payload),
        "progress": json.dumps(progress),
    })
    final = os.path.join(dir_path, filename)
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def _sync_blob_across_processes(blob: Optional[bytes]) -> Optional[bytes]:
    """Make the checkpoint bytes identical on every process: process 0's
    file (or its absence) is authoritative.

    Checkpoints are written by process 0 only; when the checkpoint dir is
    host-local rather than a shared filesystem, the other processes see no
    file. Without this sync each process would decide independently whether
    to resume — hosts would then issue different collective sequences and
    deadlock (or train desynchronized). Broadcasting the raw bytes keeps the
    decision AND the restored state identical everywhere."""
    if jax.process_count() == 1:
        return blob
    from jax.experimental import multihost_utils

    has = blob is not None and jax.process_index() == 0
    length = int(multihost_utils.broadcast_one_to_all(
        np.int64(len(blob) if has else -1)))
    if length < 0:
        return None
    buf = (np.frombuffer(blob, np.uint8) if has
           else np.zeros((length,), np.uint8))
    return np.asarray(
        multihost_utils.broadcast_one_to_all(buf)).tobytes()


def load_resume(dir_path: Optional[str], filename: str
                ) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
    """Read a checkpoint written by :func:`save_resume`.

    Returns ``(payload, progress)`` or ``None`` when no checkpoint exists.
    ``payload`` leaves come back as numpy arrays; callers restore pytree
    structure with ``flax.serialization.from_state_dict`` against a
    template and re-place on devices as needed.

    Multi-process: process 0's checkpoint is broadcast to all (see
    :func:`_sync_blob_across_processes`); a checkpoint existing only on
    another host is deliberately ignored so the resume decision has one
    authority.
    """
    blob: Optional[bytes] = None
    if dir_path:
        path = os.path.join(dir_path, filename)
        if os.path.isfile(path):
            with open(path, "rb") as f:
                blob = f.read()
    blob = _sync_blob_across_processes(blob)
    if blob is None:
        return None
    from flax import serialization

    restored = serialization.msgpack_restore(blob)
    return restored["payload"], json.loads(restored["progress"])
