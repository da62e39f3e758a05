"""Device-mesh construction and sharding layouts.

The reference is single-device (its only device code is GPU memory-growth
setup, reference ``src/train.py:37-38,184-189``); parallel execution here is
new, TPU-native capability. The mesh has two logical axes:

* ``data``  — batch (data-parallel) axis: batches shard across it, params
  replicate, XLA inserts the psum gradient reduction over ICI.
* ``trial`` — experiment axis: independent k-fold folds / sweep trials map
  onto mesh slices (reference experiments run *serially* through a W&B sweep
  agent, ``train.py:364-368``).

All layouts are expressed with ``jax.sharding.NamedSharding``; jit partitions
the programs, so the same train step runs unmodified on 1 chip or a pod
slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TRIAL_AXIS = "trial"


def make_mesh(n_data: int = -1, n_trial: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(trial, data)`` mesh. ``n_data=-1`` uses all remaining
    devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_trial <= 0:
        n_trial = 1
    if n_data == -1:
        if n % n_trial:
            raise ValueError(f"{n} devices not divisible by trial={n_trial}")
        n_data = n // n_trial
    if n_trial * n_data > n:
        raise ValueError(
            f"mesh {n_trial}x{n_data} needs {n_trial * n_data} devices, "
            f"have {n}")
    arr = np.asarray(devices[: n_trial * n_data]).reshape(n_trial, n_data)
    return Mesh(arr, (TRIAL_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def full_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over EVERY mesh device (trial x data
    flattened) — serving has no trial axis, so inference batches spread
    across the whole slice."""
    return NamedSharding(mesh, P((TRIAL_AXIS, DATA_AXIS)))


def trial_replicated(mesh: Mesh) -> NamedSharding:
    """Per-trial params: leading trial axis sharded, rest replicated."""
    return NamedSharding(mesh, P(TRIAL_AXIS))


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the PARALLEL.MESH mesh from a config, or None on a single
    device / no PARALLEL section / invalid shape."""
    pcfg = cfg.get("PARALLEL")
    if not pcfg or len(jax.devices()) <= 1:
        return None
    mesh_cfg = pcfg.get("MESH", {})
    try:
        return make_mesh(int(mesh_cfg.get("DATA", -1)),
                         int(mesh_cfg.get("TRIAL", 1)))
    except ValueError as e:
        print(f"mesh config invalid ({e}); running single-device")
        return None


def shard_batch(mesh: Optional[Mesh], *arrays):
    """Device-put arrays with the batch sharding (no-op without a mesh)."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def fetch(x) -> np.ndarray:
    """Host-materialize a possibly process-spanning array.

    ``np.asarray`` on a jax Array raises when shards live on another
    process's devices (e.g. trial-axis-sharded metrics on a multi-host
    mesh). This gathers the global value to EVERY process so host-side
    callback logic (early stopping, LR plateaus, history) runs identically
    everywhere — required for lockstep control flow across hosts. A plain
    ``np.asarray`` when the array is already local/replicated."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def host_local_batch(mesh: Mesh, *arrays):
    """Assemble a global batch-sharded array from each process's local data.

    On a multi-host pod slice every process loads only its own shard of the
    global batch (leading dim = global_batch / n_processes); this stitches
    the shards into one global ``P('data')`` array without any host
    all-gather. Single-process, it degrades to a plain sharded device_put,
    so the same input-feeding code runs on one chip, a virtual CPU mesh,
    and a pod slice (docs/SCALING.md)."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        out = tuple(jax.device_put(a, s) for a in arrays)
    else:
        out = tuple(
            jax.make_array_from_process_local_data(s, np.asarray(a))
            for a in arrays)
    return out if len(out) > 1 else out[0]
