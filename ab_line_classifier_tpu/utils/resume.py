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


def load_resume(dir_path: Optional[str], filename: str
                ) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
    """Read a checkpoint written by :func:`save_resume`.

    Returns ``(payload, progress)`` or ``None`` when no checkpoint exists.
    ``payload`` leaves come back as numpy arrays; callers restore pytree
    structure with ``flax.serialization.from_state_dict`` against a
    template and re-place on devices as needed.
    """
    if not dir_path:
        return None
    path = os.path.join(dir_path, filename)
    if not os.path.isfile(path):
        return None
    from flax import serialization

    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    return blob["payload"], json.loads(blob["progress"])
