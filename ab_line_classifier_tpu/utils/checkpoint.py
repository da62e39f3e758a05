"""Model serialization: the ``results/models/`` contract.

The reference saves whole Keras models as
``results/models/model{timestamp}.h5`` (reference ``src/train.py:139-144``)
and restores them with ``load_model`` (``src/predict.py:39-51``). The native
format here is an Orbax checkpoint directory,
``results/models/model{timestamp}/`` containing

* ``state/`` — Orbax-saved ``{params, batch_stats}`` pytree,
* ``meta.json`` — model name, hyperparameters, input shape, classes and
  preprocess mode, so ``restore_model`` can rebuild the exact ModelSpec.

``latest`` symlink-style resolution: a path that is not a checkpoint dir but a
directory of them resolves to the newest, so ``PATHS.MODEL_TO_LOAD:
results/models/latest`` keeps working like the reference's fixed-path config.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

META_NAME = "meta.json"
STATE_NAME = "state"


def save_model(model_dir: str, variables: Dict[str, Any],
               meta: Dict[str, Any]) -> str:
    """Write order is the commit protocol: Orbax state first (itself
    atomic — tmp dir renamed into place), ``meta.json`` LAST via
    tmp+rename. ``meta.json`` is the marker ``is_model_dir`` keys on, so a
    crash mid-save can never leave a directory that ``resolve_model_dir``
    would pick as the newest checkpoint but ``load_model`` cannot restore
    (which would also shadow older good checkpoints behind a broken
    'latest')."""
    model_dir = os.path.abspath(model_dir)
    os.makedirs(model_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(model_dir, STATE_NAME)
    variables = jax.tree.map(np.asarray, variables)
    ckptr.save(state_path, variables, force=True)
    ckptr.wait_until_finished()
    meta_tmp = os.path.join(model_dir, META_NAME + ".tmp")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f, indent=2, default=_json_default)
        f.flush()
        os.fsync(f.fileno())
    os.replace(meta_tmp, os.path.join(model_dir, META_NAME))
    return model_dir


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def is_model_dir(path: str) -> bool:
    # Both halves must exist: meta.json alone can be left by a save that
    # crashed before save_model's meta-last ordering existed (or by hand);
    # state alone is a save that crashed before its meta commit marker.
    return (os.path.isfile(os.path.join(path, META_NAME))
            and os.path.exists(os.path.join(path, STATE_NAME)))


def resolve_model_dir(path: str) -> str:
    """Resolve ``MODEL_TO_LOAD``: an exact checkpoint dir, or a directory of
    ``model*``-named checkpoints (newest wins), or a ``.../latest`` alias to
    the newest checkpoint in the parent directory."""
    path = os.path.abspath(path)
    if is_model_dir(path):
        return path
    search = path
    if not os.path.isdir(path) and os.path.basename(path) == "latest":
        search = os.path.dirname(path)
    if os.path.isdir(search):
        candidates = [os.path.join(search, d) for d in os.listdir(search)]
        candidates = [c for c in candidates if is_model_dir(c)]
        if candidates:
            return max(candidates, key=os.path.getmtime)
    raise FileNotFoundError(f"no model checkpoint found at {path!r}")


def load_model(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns ``(variables, meta)``.

    The restore passes a target tree rebuilt from ``meta.json`` (abstract
    init of the exact ModelSpec) — orbax treats target-less restores as
    unsafe (topology comes from disk) and warns on every call; the meta is
    the source of truth for the topology anyway. Falls back to a
    target-less restore if the spec cannot be rebuilt (e.g. meta from a
    newer version)."""
    model_dir = resolve_model_dir(path)
    with open(os.path.join(model_dir, META_NAME)) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(model_dir, STATE_NAME)
    try:
        template = _abstract_variables(meta)
        variables = ckptr.restore(state_path, template)
    except Exception:
        variables = ckptr.restore(state_path)
    return variables, meta


def _abstract_variables(meta: Dict[str, Any]):
    """Abstract {params, batch_stats} tree for the checkpointed model —
    shapes/dtypes from an eval_shape'd init, no FLOPs spent."""
    from ab_line_classifier_tpu.models import build_model  # deferred: cycle

    spec = build_model(meta["model_name"], meta["hparams"],
                       tuple(meta["input_shape"]), int(meta["n_classes"]))
    return jax.eval_shape(lambda: spec.init_variables(jax.random.PRNGKey(0)))
