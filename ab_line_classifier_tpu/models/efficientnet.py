"""EfficientNet family — the reference zoo's ``efficientnetb7`` entry
(reference ``src/models/models.py:198-245``).

Keras EfficientNet does its input normalization *inside* the model (Rescaling
1/255 then ImageNet mean/std Normalization), which is why its paired
``preprocess_input`` is a passthrough — this graph reproduces that: the model
takes raw [0,255] RGB and the zoo registers preprocess mode 'identity'.

The MBConv blocks follow the Keras implementation: expand 1x1 conv + BN +
swish, depthwise + BN + swish, squeeze-excite, project 1x1 conv + BN, with
stochastic-depth drop + residual add on identity blocks; width/depth scaling
via round_filters / round_repeats (B7: width 2.0, depth 3.1 -> 55 blocks).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ab_line_classifier_tpu import graph as G
from ab_line_classifier_tpu.models import common as C
from ab_line_classifier_tpu.models.preprocess import TORCH_MEAN_RGB, TORCH_STD_RGB

# (kernel, repeats, filters_in, filters_out, expand_ratio, stride, se_ratio)
EFFNET_BLOCK_ARGS = (
    (3, 1, 32, 16, 1, 1, 0.25),
    (3, 2, 16, 24, 6, 2, 0.25),
    (5, 2, 24, 40, 6, 2, 0.25),
    (3, 3, 40, 80, 6, 2, 0.25),
    (5, 3, 80, 112, 6, 1, 0.25),
    (5, 4, 112, 192, 6, 2, 0.25),
    (3, 1, 192, 320, 6, 1, 0.25),
)

EFFNET_PARAMS = {
    # name: (width_coefficient, depth_coefficient, dropout_rate)
    "b0": (1.0, 1.0, 0.2),
    "b1": (1.0, 1.1, 0.2),
    "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3),
    "b4": (1.4, 1.8, 0.4),
    "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5),
    "b7": (2.0, 3.1, 0.5),
}

_BN = dict(momentum=0.99, epsilon=1e-3)


def round_filters(filters: float, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _conv_init():
    return jax.nn.initializers.variance_scaling(2.0, "fan_out",
                                                "truncated_normal")


def _dwconv_init():
    """Keras EfficientNet's CONV_KERNEL_INITIALIZER on a DEPTHWISE kernel:
    variance_scaling(2.0, 'fan_out') over the Keras (kh,kw,C,1) layout has
    fan_out = kh*kw*1; the flax layout is (kh,kw,1,C), where that same fan
    is 'fan_in' — so fan_in here reproduces Keras's distribution exactly."""
    return jax.nn.initializers.variance_scaling(2.0, "fan_in",
                                                "truncated_normal")


def efficientnet_backbone(variant: str = "b7",
                          input_size: Tuple[int, int] = (128, 128),
                          drop_connect_rate: float = 0.2,
                          imagenet_stem: bool = True,
                          dtype=None) -> G.LayerGraph:
    """Keras-exact EfficientNet backbone.

    The stem mirrors keras's in-model preprocessing exactly (keras
    applications efficientnet.py): ``rescaling`` (x/255), a ``normalization``
    layer computing ``(x-mean)/sqrt(var)`` with the stats held as
    non-trainable weights, and — only for imagenet-pretrained models
    (``imagenet_stem=True``, keras inserts it only when ``weights=
    'imagenet'``) — an extra ``rescaling_1`` multiplying by ``1/sqrt(std)``
    to reproduce the original TF implementation's ``(x-mean)/var``
    normalization quirk. With ``imagenet_stem=False`` the normalization
    stats default to (0, 1), matching ``weights=None`` keras models;
    layer indices shift by one between the two, exactly as in keras.
    """
    width, depth, _ = EFFNET_PARAMS[variant]
    specs: List[G.LayerSpec] = []
    size = tuple(input_size)
    swish = nn.silu

    specs.append(G.activation("rescaling", G.INPUT, lambda x: x / 255.0))
    if imagenet_stem:
        specs.append(G.normalization("normalization", "rescaling",
                                     mean=TORCH_MEAN_RGB,
                                     variance=TORCH_STD_RGB ** 2))
        inv_sqrt_std = jnp.asarray(1.0 / np.sqrt(TORCH_STD_RGB))
        specs.append(G.activation(
            "rescaling_1", "normalization",
            lambda x: x * inv_sqrt_std.astype(x.dtype)))
        stem_in = "rescaling_1"
    else:
        specs.append(G.normalization("normalization", "rescaling",
                                     mean=(0.0, 0.0, 0.0),
                                     variance=(1.0, 1.0, 1.0)))
        stem_in = "normalization"

    stem_filters = round_filters(32, width)
    specs.append(G.zero_pad("stem_conv_pad", stem_in,
                            C.correct_pad(size, 3)))
    specs.append(G.conv2d("stem_conv", "stem_conv_pad", stem_filters, (3, 3),
                          strides=(2, 2), padding="VALID", use_bias=False,
                          kernel_init=_conv_init(), dtype=dtype))
    size = C.stride2_out(size)
    specs.append(G.batch_norm("stem_bn", "stem_conv", dtype=dtype, **_BN))
    specs.append(G.activation("stem_activation", "stem_bn", swish))
    prev = "stem_activation"

    total_blocks = sum(round_repeats(r, depth) for _, r, *_ in EFFNET_BLOCK_ARGS)
    block_num = 0
    in_ch = stem_filters

    for stage_idx, (kernel, repeats, f_in, f_out, expand, stride,
                    se_ratio) in enumerate(EFFNET_BLOCK_ARGS, start=1):
        filters_out = round_filters(f_out, width)
        for rep in range(round_repeats(repeats, depth)):
            b = f"block{stage_idx}{chr(ord('a') + rep)}"
            s = stride if rep == 0 else 1
            filters = in_ch * expand
            drop_rate = drop_connect_rate * block_num / total_blocks

            x = prev
            if expand != 1:
                specs.append(G.conv2d(f"{b}_expand_conv", x, filters, (1, 1),
                                      use_bias=False,
                                      kernel_init=_conv_init(), dtype=dtype))
                specs.append(G.batch_norm(f"{b}_expand_bn", f"{b}_expand_conv",
                                          dtype=dtype, **_BN))
                specs.append(G.activation(f"{b}_expand_activation",
                                          f"{b}_expand_bn", swish))
                x = f"{b}_expand_activation"

            if s == 2:
                specs.append(G.zero_pad(f"{b}_dwconv_pad", x,
                                        C.correct_pad(size, kernel)))
                specs.append(G.depthwise_conv2d(
                    f"{b}_dwconv", f"{b}_dwconv_pad", filters,
                    (kernel, kernel), strides=(2, 2), padding="VALID",
                    kernel_init=_dwconv_init(), dtype=dtype))
                size = C.stride2_out(size)
            else:
                specs.append(G.depthwise_conv2d(
                    f"{b}_dwconv", x, filters, (kernel, kernel),
                    padding="SAME", kernel_init=_dwconv_init(),
                    dtype=dtype))
            specs.append(G.batch_norm(f"{b}_bn", f"{b}_dwconv", dtype=dtype,
                                      **_BN))
            specs.append(G.activation(f"{b}_activation", f"{b}_bn", swish))
            x = f"{b}_activation"

            # Squeeze-and-excite (se filters derive from the block's input
            # channel count, as in Keras).
            se_filters = max(1, int(in_ch * se_ratio))
            specs.append(G.LayerSpec(
                name=f"{b}_se_squeeze", kind=G.KIND_FN, inputs=(x,),
                fn=lambda t: jnp.mean(t, axis=(1, 2))))
            # keras: GlobalAveragePooling2D then Reshape((1,1,C)) as its own
            # layer — kept separate for exact layer-index parity.
            specs.append(G.LayerSpec(
                name=f"{b}_se_reshape", kind=G.KIND_FN,
                inputs=(f"{b}_se_squeeze",),
                fn=lambda t: t[:, None, None, :]))
            specs.append(G.conv2d(f"{b}_se_reduce", f"{b}_se_reshape",
                                  se_filters, (1, 1), act=swish,
                                  kernel_init=_conv_init(), dtype=dtype))
            specs.append(G.conv2d(f"{b}_se_expand", f"{b}_se_reduce", filters,
                                  (1, 1), act=nn.sigmoid,
                                  kernel_init=_conv_init(), dtype=dtype))
            specs.append(G.multiply(f"{b}_se_excite", x, f"{b}_se_expand"))

            specs.append(G.conv2d(f"{b}_project_conv", f"{b}_se_excite",
                                  filters_out, (1, 1), use_bias=False,
                                  kernel_init=_conv_init(), dtype=dtype))
            specs.append(G.batch_norm(f"{b}_project_bn", f"{b}_project_conv",
                                      dtype=dtype, **_BN))
            out = f"{b}_project_bn"

            if s == 1 and in_ch == filters_out:
                if drop_rate > 0:
                    # Stochastic depth: whole-sample drop (keras Dropout with
                    # noise_shape=(None,1,1,1)).
                    rate = drop_rate
                    specs.append(G.LayerSpec(
                        name=f"{b}_drop", kind=G.KIND_DROPOUT, inputs=(out,),
                        module_fn=lambda name, rate=rate: nn.Dropout(
                            rate=rate, name=name, broadcast_dims=(1, 2, 3))))
                    out = f"{b}_drop"
                specs.append(G.add(f"{b}_add", out, prev))
                out = f"{b}_add"

            prev = out
            in_ch = filters_out
            block_num += 1

    top_filters = round_filters(1280, width)
    specs.append(G.conv2d("top_conv", prev, top_filters, (1, 1),
                          use_bias=False, kernel_init=_conv_init(),
                          dtype=dtype))
    specs.append(G.batch_norm("top_bn", "top_conv", dtype=dtype, **_BN))
    specs.append(G.activation("top_activation", "top_bn", swish))

    return G.graph_of(*specs)


def build_efficientnetb7(hparams: Dict[str, Any],
                         input_shape: Tuple[int, int, int], n_classes: int,
                         mixed_precision: bool = False,
                         output_bias: Optional[np.ndarray] = None) -> C.ModelSpec:
    dtype = jnp.bfloat16 if mixed_precision else None
    backbone = efficientnet_backbone("b7", input_size=tuple(input_shape[:2]),
                                     dtype=dtype)
    graph, regs = C.classifier_head(
        backbone, n_classes=n_classes, dropout=float(hparams["DROPOUT"]),
        output_bias=output_bias, dtype=dtype)
    phases = C.single_phase(graph, int(hparams.get("FREEZE_IDX", -1)),
                            float(hparams["LR"]),
                            backbone_len=len(backbone.layers))
    return C.ModelSpec(name="efficientnetb7", graph=graph,
                       preprocess_mode="identity", phases=phases,
                       input_shape=tuple(input_shape), n_classes=n_classes,
                       activity_regularizers=regs)
