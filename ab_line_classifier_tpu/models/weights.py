"""Keras ``.h5`` weight import.

The reference warm-starts models by name-matched layer weight copy from a
saved Keras h5 (reference ``src/models/model_utils.py:6-23``) and serves
``.h5`` checkpoints directly (``src/predict.py:50``). Because this zoo names
every graph node with its Keras layer name, the same name matching works
here: h5 layer groups map onto ``params[layer_name]`` with the dtype-layout
conversions Keras<->Flax need:

* Conv2D kernel ``(h, w, in, out)`` — identical layout, no transpose.
* Dense kernel ``(in, out)`` — identical.
* DepthwiseConv2D ``(h, w, in, 1)`` -> grouped-conv kernel ``(h, w, 1, in)``.
* SeparableConv2D -> the ``depthwise`` / ``pointwise`` submodules.
* BatchNormalization gamma/beta -> scale/bias; moving mean/variance ->
  ``batch_stats``.

Layers present in only one side are skipped with a notice, exactly like the
reference's try/except copy loop.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _h5_layer_weights(h5_file, layer_name: str) -> Dict[str, np.ndarray]:
    """Flatten one layer's weight arrays out of a Keras h5 file."""
    root = h5_file["model_weights"] if "model_weights" in h5_file else h5_file
    if layer_name not in root:
        return {}
    group = root[layer_name]
    out: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        import h5py

        if isinstance(obj, h5py.Dataset):
            out[name.split("/")[-1].replace(":0", "")] = np.asarray(obj)

    group.visititems(visit)
    return out


def import_h5_weights(h5_path: str, variables: Dict[str, Any],
                      verbose: bool = True) -> Tuple[Dict[str, Any], int]:
    """Copy name-matched weights from a Keras h5 into a variables pytree
    ``{params, batch_stats}``. Returns (new_variables, n_layers_copied)."""
    import h5py

    params = {k: dict(v) for k, v in variables["params"].items()}
    batch_stats = {k: dict(v)
                   for k, v in variables.get("batch_stats", {}).items()}
    copied = 0

    with h5py.File(h5_path, "r") as f:
        for layer_name in list(params):
            w = _h5_layer_weights(f, layer_name)
            if not w:
                if verbose:
                    print(f"{layer_name} is not in the h5 file.")
                continue
            p = params[layer_name]
            try:
                if "depthwise" in p:  # SeparableConv2D
                    dw = w["depthwise_kernel"]
                    p["depthwise"] = dict(p["depthwise"])
                    p["depthwise"]["kernel"] = dw.transpose(0, 1, 3, 2)
                    p["pointwise"] = dict(p["pointwise"])
                    p["pointwise"]["kernel"] = w["pointwise_kernel"]
                    if "bias" in w and "bias" in p["pointwise"]:
                        p["pointwise"]["bias"] = w["bias"]
                elif "depthwise_kernel" in w:  # DepthwiseConv2D
                    p["kernel"] = w["depthwise_kernel"].transpose(0, 1, 3, 2)
                    if "bias" in w and "bias" in p:
                        p["bias"] = w["bias"]
                elif "gamma" in w or "beta" in w:  # BatchNormalization
                    if "gamma" in w and "scale" in p:
                        p["scale"] = w["gamma"]
                    if "beta" in w and "bias" in p:
                        p["bias"] = w["beta"]
                    if layer_name in batch_stats:
                        if "moving_mean" in w:
                            batch_stats[layer_name]["mean"] = w["moving_mean"]
                        if "moving_variance" in w:
                            batch_stats[layer_name]["var"] = \
                                w["moving_variance"]
                elif "kernel" in w:  # Conv2D / Dense
                    if p["kernel"].shape != w["kernel"].shape:
                        raise ValueError(
                            f"shape mismatch {p['kernel'].shape} vs "
                            f"{w['kernel'].shape}")
                    p["kernel"] = w["kernel"]
                    if "bias" in w and "bias" in p:
                        p["bias"] = w["bias"]
                else:
                    raise ValueError(f"unrecognized weight set {list(w)}")
                copied += 1
            except Exception as e:
                if verbose:
                    print(f"could not copy {layer_name}: {e}")

        # Stats-only layers (keras Normalization: mean/variance/count live in
        # batch_stats with no trainable params, e.g. EfficientNet's stem).
        for layer_name in list(batch_stats):
            if layer_name in params:
                continue
            w = _h5_layer_weights(f, layer_name)
            if "mean" in w and "variance" in w:
                batch_stats[layer_name]["mean"] = w["mean"].reshape(-1)
                batch_stats[layer_name]["variance"] = \
                    w["variance"].reshape(-1)
                copied += 1

    out = dict(variables)
    out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out, copied


def export_h5_weights(h5_path: str, variables: Dict[str, Any]) -> None:
    """Write params to a Keras-style h5 layout (round-trip for parity
    tests and for users migrating back)."""
    import h5py

    with h5py.File(h5_path, "w") as f:
        root = f.create_group("model_weights")
        bs = variables.get("batch_stats", {})
        for layer_name, p in variables["params"].items():
            g = root.create_group(layer_name).create_group(layer_name)
            if "depthwise" in p:
                g.create_dataset(
                    "depthwise_kernel:0",
                    data=np.asarray(p["depthwise"]["kernel"]).transpose(
                        0, 1, 3, 2))
                g.create_dataset("pointwise_kernel:0",
                                 data=np.asarray(p["pointwise"]["kernel"]))
                if "bias" in p["pointwise"]:
                    g.create_dataset("bias:0",
                                     data=np.asarray(p["pointwise"]["bias"]))
            elif "scale" in p or layer_name in bs:
                if "scale" in p:
                    g.create_dataset("gamma:0", data=np.asarray(p["scale"]))
                if "bias" in p:
                    g.create_dataset("beta:0", data=np.asarray(p["bias"]))
                if layer_name in bs:
                    g.create_dataset("moving_mean:0",
                                     data=np.asarray(bs[layer_name]["mean"]))
                    g.create_dataset("moving_variance:0",
                                     data=np.asarray(bs[layer_name]["var"]))
            else:
                g.create_dataset("kernel:0", data=np.asarray(p["kernel"]))
                if "bias" in p:
                    g.create_dataset("bias:0", data=np.asarray(p["bias"]))
        # Stats-only layers (keras Normalization) have no params entry;
        # mirror the importer so export/import round-trips.
        for layer_name, stats in bs.items():
            if layer_name in variables["params"] or "variance" not in stats:
                continue
            g = root.create_group(layer_name).create_group(layer_name)
            g.create_dataset("mean", data=np.asarray(stats["mean"]))
            g.create_dataset("variance", data=np.asarray(stats["variance"]))
