"""U-Net for ultrasound-beam segmentation (auto-masking).

The reference's auto-masking loads a pretrained Keras U-Net ``.h5`` that maps
128x128 grayscale frames to beam-probability masks (reference
``src/data/auto_masking.py:28-77``: input resized to ``(128,128,1)``, scaled
by 1/255, output thresholded at 0.4). The architecture here is a standard
4-level encoder/decoder U-Net with skip connections producing a sigmoid
mask. Unlike the classifier zoo it is a plain ``nn.Module`` (the zoo's
layer-graph IR exists for Keras layer-index parity, which has no meaning
for an unshipped U-Net checkpoint); serialization goes through the normal
Orbax checkpoint dirs, and Keras ``.h5`` U-Nets import via
:func:`import_h5_unet_weights` — position+shape matched, since the
reference's pretrained file's layer names are not knowable from its repo.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class UNet(nn.Module):
    """4-level U-Net: 128x128x1 -> 128x128x1 sigmoid beam mask."""

    base_filters: int = 16
    levels: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = self.dtype
        skips = []
        # Encoder
        for level in range(self.levels):
            f = self.base_filters * (2 ** level)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"enc{level}_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"enc{level}_conv2")(x)
            x = nn.relu(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # Bottleneck
        f = self.base_filters * (2 ** self.levels)
        x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                    name="bottleneck_conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                    name="bottleneck_conv2")(x)
        x = nn.relu(x)
        # Decoder
        for level in reversed(range(self.levels)):
            f = self.base_filters * (2 ** level)
            # transpose_kernel=True gives Keras Conv2DTranspose semantics
            # (gradient-of-conv, kernel stored (kh, kw, out, in)) so a
            # pretrained Keras kernel imports verbatim and bit-matches.
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=dtype,
                                 transpose_kernel=True,
                                 name=f"dec{level}_up")(x)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"dec{level}_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"dec{level}_conv2")(x)
            x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=dtype, name="head")(x)
        return nn.sigmoid(x.astype(jnp.float32))


def unet_layer_order(levels: int = 4) -> List[str]:
    """Weighted-layer names in module (= topological) order."""
    names = []
    for lv in range(levels):
        names += [f"enc{lv}_conv1", f"enc{lv}_conv2"]
    names += ["bottleneck_conv1", "bottleneck_conv2"]
    for lv in reversed(range(levels)):
        names += [f"dec{lv}_up", f"dec{lv}_conv1", f"dec{lv}_conv2"]
    names.append("head")
    return names


def import_h5_unet_weights(path: str, variables: Dict) -> Dict:
    """Load a Keras U-Net ``.h5`` onto the flax :class:`UNet` params.

    The reference restores a pretrained Keras U-Net ``.h5`` (reference
    ``auto_masking.py:28-29``); that file is not shipped, so its layer
    names cannot be matched — weights are matched by POSITION over the
    file's weighted layers in Keras storage order, with strict shape
    checking. Conv2DTranspose kernels load verbatim: :class:`UNet` uses
    ``transpose_kernel=True`` so flax stores them in Keras's
    ``(kh, kw, out, in)`` layout with identical (gradient-of-conv)
    semantics — golden-tested against a real saved Keras U-Net in
    ``tests/test_keras_parity.py``. A U-Net of a different width/depth
    fails loudly instead of silently masking with random weights.
    """
    import h5py

    params = dict(variables["params"])
    order = [n for n in unet_layer_order() if n in params]

    def _dec(s):
        return s.decode() if isinstance(s, bytes) else s

    weighted = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        layer_names = [_dec(n) for n in
                       g.attrs.get("layer_names", list(g.keys()))]
        for ln in layer_names:
            names = [_dec(n) for n in
                     g[ln].attrs.get("weight_names", [])]
            arrs = [np.asarray(g[ln][n]) for n in names]
            if arrs:
                weighted.append((ln, arrs))
    if len(weighted) != len(order):
        raise ValueError(
            f"{path!r} has {len(weighted)} weighted layers; this UNet has "
            f"{len(order)} — not a compatible U-Net architecture")
    new = {}
    for (ln, arrs), ours in zip(weighted, order):
        tgt = dict(params[ours])
        kern, rest = arrs[0], arrs[1:]
        want = tuple(np.shape(tgt["kernel"]))
        if tuple(kern.shape) == want:
            pass
        elif (kern.ndim == 4
              and tuple(kern.transpose(0, 1, 3, 2).shape) == want):
            # non-Keras (in, out)-layout transpose-conv kernel
            kern = kern.transpose(0, 1, 3, 2)
        else:
            raise ValueError(
                f"layer {ln!r} -> {ours!r}: kernel shape {kern.shape} "
                f"does not map to {want}")
        tgt["kernel"] = kern
        if rest and "bias" in tgt:
            if tuple(rest[0].shape) != tuple(np.shape(tgt["bias"])):
                raise ValueError(
                    f"layer {ln!r} -> {ours!r}: bias shape "
                    f"{rest[0].shape} != {np.shape(tgt['bias'])}")
            tgt["bias"] = rest[0]
        new[ours] = tgt
    return {**variables, "params": {**params, **new}}
