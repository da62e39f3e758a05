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

import re
import warnings
from typing import Any, Dict, List, Tuple

import numpy as np

from ..graph import KIND_DEPTHWISE


def _h5_layer_names(h5_file) -> List[str]:
    """Top-level layer group names in a name-addressable Keras h5."""
    root = h5_file["model_weights"] if "model_weights" in h5_file else h5_file
    return [k for k in root.keys() if k != "top_level_model_weights"]


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


def _put(d: Dict[str, Any], key: str, arr, ctx: str = "") -> None:
    """Shape-checked assignment into a STAGED layer dict — the single
    commit primitive both import layouts use: a wrong-shape h5 array must
    fail here with the layer context instead of at jit trace time, and
    callers commit the staged dict only after every ``_put`` succeeds so
    a mid-layer failure cannot leave a half-imported layer."""
    arr = np.asarray(arr)
    if tuple(np.shape(d[key])) != tuple(arr.shape):
        raise ValueError(
            f"{key} shape mismatch {tuple(np.shape(d[key]))} vs "
            f"{tuple(arr.shape)}" + (f" ({ctx})" if ctx else ""))
    d[key] = arr


def _keras3_class_of(node_kind: str, layer_params) -> str:
    """The keras class prefix keras 3 uses as the h5 group name."""
    if layer_params is not None and "depthwise" in layer_params:
        return "separable_conv2d"
    return {
        "conv": "conv2d",
        "depthwise": "depthwise_conv2d",
        "bn": "batch_normalization",
        "dense": "dense",
        "norm": "normalization",
    }.get(node_kind, node_kind)


def _import_keras3_h5(f, params, batch_stats, graph, verbose,
                      copied_names=None) -> int:
    """Keras 3 ``.weights.h5`` layout: ``layers/<class>[_N]/vars/<i>``, named
    by per-class creation counters rather than layer names. Weighted graph
    nodes map onto the groups by (keras class, creation order) — valid
    because this graph IR appends nodes in the reference's Keras call order.
    Var order per class follows keras ``layer.weights``."""
    groups: Dict[str, list] = {}
    for gname in f["layers"]:
        cls, _, suffix = gname.rpartition("_")
        if suffix.isdigit() and cls:
            groups.setdefault(cls, []).append((int(suffix), gname))
        else:
            groups.setdefault(gname, []).append((-1, gname))
    for v in groups.values():
        v.sort()
    cursor = {k: 0 for k in groups}

    copied = 0
    for spec in graph.layers:
        name = spec.name
        has_p = name in params
        has_bs = name in batch_stats
        if not (has_p or has_bs):
            continue
        cls = _keras3_class_of(spec.kind, params.get(name))
        if cls not in groups or cursor[cls] >= len(groups[cls]):
            if verbose:
                print(f"{name} ({cls}) is not in the h5 file.")
            continue
        gname = groups[cls][cursor[cls]][1]
        cursor[cls] += 1
        g = f["layers"][gname]["vars"]
        ws = [np.asarray(g[str(i)]) for i in range(len(g))]
        p = params.get(name)

        def put(d, key, arr):
            # Shape checks matter doubly here: class+order addressing
            # means a misaligned cursor binds the wrong group, and for
            # classes whose shapes often coincide across layers (BN in
            # Xception's 728-wide middle flow) a silent positional copy
            # would commit wrong weights with no error.
            _put(d, key, arr, ctx=f"h5 group {gname}")

        try:
            new_p = dict(p) if p is not None else None
            new_bs = dict(batch_stats[name]) if has_bs else None
            if cls == "separable_conv2d":
                new_p["depthwise"] = dict(new_p["depthwise"])
                put(new_p["depthwise"], "kernel", ws[0].transpose(0, 1, 3, 2))
                new_p["pointwise"] = dict(new_p["pointwise"])
                put(new_p["pointwise"], "kernel", ws[1])
                if len(ws) > 2 and "bias" in new_p["pointwise"]:
                    put(new_p["pointwise"], "bias", ws[2])
            elif cls == "depthwise_conv2d":
                put(new_p, "kernel", ws[0].transpose(0, 1, 3, 2))
                if len(ws) > 1 and "bias" in new_p:
                    put(new_p, "bias", ws[1])
            elif cls == "batch_normalization":
                i = 0
                if "scale" in new_p:  # keras var order: [gamma] beta mean var
                    put(new_p, "scale", ws[i])
                    i += 1
                put(new_p, "bias", ws[i])
                put(new_bs, "mean", ws[-2])
                put(new_bs, "var", ws[-1])
            elif cls == "normalization":
                put(new_bs, "mean", ws[0].reshape(-1))
                put(new_bs, "variance", ws[1].reshape(-1))
            else:  # conv2d / dense
                put(new_p, "kernel", ws[0])
                if len(ws) > 1 and "bias" in new_p:
                    put(new_p, "bias", ws[1])
            if new_p is not None:
                params[name] = new_p
            if new_bs is not None:
                batch_stats[name] = new_bs
            copied += 1
            if copied_names is not None:
                copied_names.append(name)
        except Exception as e:
            if verbose:
                print(f"could not copy {name}: {e}")
    return copied


def import_h5_weights(h5_path: str, variables: Dict[str, Any],
                      verbose: bool = True,
                      graph=None,
                      copied_names=None) -> Tuple[Dict[str, Any], int]:
    """Copy weights from a Keras h5 into a variables pytree
    ``{params, batch_stats}``. Returns (new_variables, n_layers_copied).

    Three layouts are supported: the Keras 2.x / TF-2.9 full-model layout
    the reference's checkpoints use (name-addressable
    ``model_weights/<layer>/...``, reference predict.py:50), the
    weights-only legacy layout ``keras.applications`` ImageNet files ship
    (``*_notop.h5`` — layer groups at the file root, which is how the
    reference's every transfer model bootstraps, reference
    models.py:59,110,161,206,398), and Keras 3 ``.weights.h5`` (class+order
    addressed — requires ``graph`` to recover the layer order).

    ``copied_names``, if a list, collects the layer names actually copied —
    callers that overlay a warm start onto an existing init (the
    trial-parallel trainer) need to know which layers to overwrite."""
    import h5py

    params = {k: dict(v) for k, v in variables["params"].items()}
    batch_stats = {k: dict(v)
                   for k, v in variables.get("batch_stats", {}).items()}
    copied = 0

    with h5py.File(h5_path, "r") as f:
        if "layers" in f and "model_weights" not in f:
            if graph is None:
                raise ValueError(
                    "this is a Keras 3 .weights.h5 (layer groups are not "
                    "name-addressable); pass graph= to map by layer order")
            copied = _import_keras3_h5(f, params, batch_stats, graph,
                                       verbose, copied_names=copied_names)
            out = dict(variables)
            out["params"] = params
            if batch_stats:
                out["batch_stats"] = batch_stats
            return out, copied
        for layer_name in list(params):
            w = _h5_layer_weights(f, layer_name)
            if not w and layer_name == "logits":
                # The head Dense carries different names in the reference:
                # cutoffvgg16/custom_resnetv2 call it 'output'
                # (models.py:418,376), cnn0's is Keras-AUTO-named
                # (models.py:287 — the only unnamed Dense, so 'dense';
                # donors with more unnamed Denses get 'dense_1',
                # 'dense_2', ...). Resolution is deterministic: explicit
                # head names first, then every auto-named dense group in
                # the file in DESCENDING suffix order — Keras numbers
                # layers in creation order and the reference heads are
                # always created last, so when a hidden 'dense' and a
                # head 'dense_1' BOTH shape-match (e.g. NODES_DENSE0 ==
                # n_classes), the true head wins, not whichever the
                # alias list happened to try first.
                auto = sorted(
                    (n for n in _h5_layer_names(f)
                     if re.fullmatch(r"dense(_\d+)?", n)),
                    key=lambda n: int(n.split("_")[1]) if "_" in n else 0,
                    reverse=True)
                for alias in ("output", "logits_dense", *auto):
                    cand = _h5_layer_weights(f, alias)
                    if ("kernel" in cand
                            and cand["kernel"].shape
                            == params[layer_name]["kernel"].shape):
                        w = cand
                        break
            if not w:
                if verbose:
                    print(f"{layer_name} is not in the h5 file.")
                continue
            # Stage into copies and commit per layer only if every branch
            # succeeds (the shared ``_put`` primitive, same discipline as
            # the Keras-3 path).
            def put(d, key, arr):
                _put(d, key, arr, ctx=layer_name)

            try:
                new_p = dict(params[layer_name])
                new_bs = (dict(batch_stats[layer_name])
                          if layer_name in batch_stats else None)
                if "depthwise" in new_p:  # SeparableConv2D
                    dw = w["depthwise_kernel"]
                    new_p["depthwise"] = dict(new_p["depthwise"])
                    put(new_p["depthwise"], "kernel",
                        dw.transpose(0, 1, 3, 2))
                    new_p["pointwise"] = dict(new_p["pointwise"])
                    put(new_p["pointwise"], "kernel", w["pointwise_kernel"])
                    if "bias" in w and "bias" in new_p["pointwise"]:
                        put(new_p["pointwise"], "bias", w["bias"])
                elif "depthwise_kernel" in w:  # DepthwiseConv2D
                    put(new_p, "kernel",
                        w["depthwise_kernel"].transpose(0, 1, 3, 2))
                    if "bias" in w and "bias" in new_p:
                        put(new_p, "bias", w["bias"])
                elif "gamma" in w or "beta" in w:  # BatchNormalization
                    if "gamma" in w and "scale" in new_p:
                        put(new_p, "scale", w["gamma"])
                    if "beta" in w and "bias" in new_p:
                        put(new_p, "bias", w["beta"])
                    if new_bs is not None:
                        if "moving_mean" in w:
                            put(new_bs, "mean", w["moving_mean"])
                        if "moving_variance" in w:
                            put(new_bs, "var", w["moving_variance"])
                elif "kernel" in w:  # Conv2D / Dense
                    put(new_p, "kernel", w["kernel"])
                    if "bias" in w and "bias" in new_p:
                        put(new_p, "bias", w["bias"])
                else:
                    raise ValueError(f"unrecognized weight set {list(w)}")
                params[layer_name] = new_p
                if new_bs is not None:
                    batch_stats[layer_name] = new_bs
                copied += 1
                if copied_names is not None:
                    copied_names.append(layer_name)
            except Exception as e:
                if verbose:
                    print(f"could not copy {layer_name}: {e}")

        # Stats-only layers (keras Normalization: mean/variance/count live in
        # batch_stats with no trainable params, e.g. EfficientNet's stem) —
        # staged + shape-checked like every other assignment.
        for layer_name in list(batch_stats):
            if layer_name in params:
                continue
            w = _h5_layer_weights(f, layer_name)
            if "mean" in w and "variance" in w:
                try:
                    new_bs = dict(batch_stats[layer_name])
                    _put(new_bs, "mean", w["mean"].reshape(-1),
                         ctx=layer_name)
                    _put(new_bs, "variance", w["variance"].reshape(-1),
                         ctx=layer_name)
                    batch_stats[layer_name] = new_bs
                    copied += 1
                    if copied_names is not None:
                        copied_names.append(layer_name)
                except Exception as e:
                    if verbose:
                        print(f"could not copy {layer_name}: {e}")

    out = dict(variables)
    out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out, copied


def export_h5_weights(h5_path: str, variables: Dict[str, Any],
                      graph=None) -> None:
    """Write params to the Keras-2.x h5 layout (round-trip for parity tests
    and for users migrating back to the reference's Keras stack).

    Keras ``load_weights(by_name=True)`` does NOT walk the hdf5 tree — it
    reads the ``layer_names`` group attribute and each layer group's
    ``weight_names`` attribute (legacy hdf5 format), so both are written
    here and verified against real tf.keras in
    ``tests/test_keras_parity.py``. Pass ``graph`` (the LayerGraph) to
    distinguish DepthwiseConv2D nodes exactly — Keras names their kernel
    ``depthwise_kernel:0`` with layout ``(h, w, C, 1)``, not ``kernel:0``
    ``(h, w, 1, C)``. Without a graph, the ``(h, w, 1, C)`` kernel shape
    alone is AMBIGUOUS — a plain conv on a 1-channel (grayscale) input has
    the identical shape (this repo's own U-Net does, models/unet.py) — so
    the graphless heuristic additionally requires the zoo's depthwise
    naming convention (``*_depthwise`` / ``*_dwconv``); ambiguous layers
    matching neither export as plain ``kernel:0`` convs."""
    import h5py

    kinds = ({spec.name: spec.kind for spec in graph.layers}
             if graph is not None else {})

    def _is_depthwise(layer_name: str, p) -> bool:
        if layer_name in kinds:
            return kinds[layer_name] == KIND_DEPTHWISE
        k = np.asarray(p["kernel"])
        ambiguous = k.ndim == 4 and k.shape[2] == 1 and k.shape[3] > 1
        named = "depthwise" in layer_name or "dwconv" in layer_name
        if ambiguous and not named:
            # Resolved, but make the silent half visible: an out-of-zoo
            # DepthwiseConv2D named e.g. 'conv_dw_1' would land here and
            # export in the plain-conv layout Keras cannot bind by name.
            warnings.warn(
                f"layer {layer_name!r} has the shape-ambiguous (h, w, 1, "
                f"C) kernel but no depthwise naming; exporting as a plain "
                f"conv kernel:0 — pass graph= if it is a DepthwiseConv2D")
        return ambiguous and named

    with h5py.File(h5_path, "w") as f:
        root = f.create_group("model_weights")
        root.attrs["backend"] = np.bytes_(b"tensorflow")
        root.attrs["keras_version"] = np.bytes_(b"2.9.0")
        bs = variables.get("batch_stats", {})
        layer_names = []

        def write_layer(layer_name, weights):
            """One layer group with its Keras ``weight_names`` attr."""
            g = root.create_group(layer_name).create_group(layer_name)
            names = []
            for wname, arr in weights:
                g.create_dataset(wname, data=np.asarray(arr))
                names.append(f"{layer_name}/{wname}".encode())
            root[layer_name].attrs["weight_names"] = names
            layer_names.append(layer_name.encode())

        for layer_name, p in variables["params"].items():
            if "depthwise" in p:  # SeparableConv2D
                ws = [("depthwise_kernel:0",
                       np.asarray(p["depthwise"]["kernel"]).transpose(
                           0, 1, 3, 2)),
                      ("pointwise_kernel:0", p["pointwise"]["kernel"])]
                if "bias" in p["pointwise"]:
                    ws.append(("bias:0", p["pointwise"]["bias"]))
            elif "scale" in p or layer_name in bs:  # BatchNormalization
                ws = []
                if "scale" in p:
                    ws.append(("gamma:0", p["scale"]))
                if "bias" in p:
                    ws.append(("beta:0", p["bias"]))
                if layer_name in bs:
                    ws.append(("moving_mean:0", bs[layer_name]["mean"]))
                    ws.append(("moving_variance:0", bs[layer_name]["var"]))
            elif _is_depthwise(layer_name, p):  # DepthwiseConv2D
                ws = [("depthwise_kernel:0",
                       np.asarray(p["kernel"]).transpose(0, 1, 3, 2))]
                if "bias" in p:
                    ws.append(("bias:0", p["bias"]))
            else:  # Conv2D / Dense
                ws = [("kernel:0", p["kernel"])]
                if "bias" in p:
                    ws.append(("bias:0", p["bias"]))
            write_layer(layer_name, ws)

        # Stats-only layers (keras Normalization) have no params entry;
        # Keras tracks [mean, variance, count] — count is adapt()-time
        # bookkeeping we don't carry, exported as 0 so by-name loading
        # sees the full weight list.
        for layer_name, stats in bs.items():
            if layer_name in variables["params"] or "variance" not in stats:
                continue
            write_layer(layer_name,
                        [("mean:0", stats["mean"]),
                         ("variance:0", stats["variance"]),
                         ("count:0", np.asarray(0, np.int64))])
        root.attrs["layer_names"] = layer_names
