"""MobileNetV2 with Keras layer-name and layer-index parity.

The reference cuts the Keras MobileNetV2 at ``CUTOFF_IDX`` and freezes up to
``FREEZE_IDX`` *by layer-list index* (reference ``src/models/models.py:78-82``
with config ``CUTOFF_IDX: 115`` / ``FREEZE_IDX: 116``, ``config.yml:103-104``).
For those indices to mean the same thing here, this graph reproduces the Keras
layer list exactly — same names, same order, 154 layers for alpha=1.0
include_top=False (index 115 = ``block_12_add``, so the default cutoff keeps
the stack through block 12 and the default freeze freezes all of it).

Head (reference models.py:84-92): GAP -> Dropout -> Dense(NODES_DENSE0, relu,
activity-L2) -> Dropout -> Dense(n_classes) -> softmax.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ab_line_classifier_tpu import graph as G
from ab_line_classifier_tpu.models import common as C

# Inverted-residual stage config (expansion t, channels c, repeats n, stride s)
# for alpha=1.0.
MBV2_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

_BN = dict(momentum=0.999, epsilon=1e-3)  # keras MobileNetV2 BN settings


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def mobilenetv2_backbone(input_size: Tuple[int, int] = (128, 128),
                         dtype=None) -> G.LayerGraph:
    """Full MobileNetV2 backbone, Keras layer order/names."""
    specs: List[G.LayerSpec] = []
    size = tuple(input_size)

    specs.append(G.conv2d("Conv1", G.INPUT, 32, (3, 3), strides=(2, 2),
                          padding="SAME", use_bias=False, dtype=dtype))
    size = C.stride2_out(size)
    specs.append(G.batch_norm("bn_Conv1", "Conv1", dtype=dtype, **_BN))
    specs.append(G.activation("Conv1_relu", "bn_Conv1", relu6))
    prev = "Conv1_relu"
    in_ch = 32

    block_id = 0
    for t, c, n, s in MBV2_STAGES:
        for i in range(n):
            stride = s if i == 0 else 1
            if block_id == 0:
                p = "expanded_conv"
                x = prev  # no expansion conv in the first block
                dw_in = in_ch
            else:
                p = f"block_{block_id}"
                dw_in = in_ch * t
                specs.append(G.conv2d(f"{p}_expand", prev, dw_in, (1, 1),
                                      use_bias=False, dtype=dtype))
                specs.append(G.batch_norm(f"{p}_expand_BN", f"{p}_expand",
                                          dtype=dtype, **_BN))
                specs.append(G.activation(f"{p}_expand_relu", f"{p}_expand_BN",
                                          relu6))
                x = f"{p}_expand_relu"

            if stride == 2:
                pad = C.correct_pad(size, 3)
                specs.append(G.zero_pad(f"{p}_pad", x, pad))
                specs.append(G.depthwise_conv2d(
                    f"{p}_depthwise", f"{p}_pad", dw_in, (3, 3),
                    strides=(2, 2), padding="VALID", dtype=dtype))
                size = C.stride2_out(size)
            else:
                specs.append(G.depthwise_conv2d(
                    f"{p}_depthwise", x, dw_in, (3, 3), padding="SAME",
                    dtype=dtype))
            specs.append(G.batch_norm(f"{p}_depthwise_BN", f"{p}_depthwise",
                                      dtype=dtype, **_BN))
            specs.append(G.activation(f"{p}_depthwise_relu",
                                      f"{p}_depthwise_BN", relu6))

            specs.append(G.conv2d(f"{p}_project", f"{p}_depthwise_relu", c,
                                  (1, 1), use_bias=False, dtype=dtype))
            specs.append(G.batch_norm(f"{p}_project_BN", f"{p}_project",
                                      dtype=dtype, **_BN))
            out = f"{p}_project_BN"

            if stride == 1 and in_ch == c and block_id > 0:
                specs.append(G.add(f"{p}_add", prev, out))
                out = f"{p}_add"

            prev = out
            in_ch = c
            block_id += 1

    specs.append(G.conv2d("Conv_1", prev, 1280, (1, 1), use_bias=False,
                          dtype=dtype))
    specs.append(G.batch_norm("Conv_1_bn", "Conv_1", dtype=dtype, **_BN))
    specs.append(G.activation("out_relu", "Conv_1_bn", relu6))

    return G.graph_of(*specs)


def build_mobilenetv2(hparams: Dict[str, Any],
                      input_shape: Tuple[int, int, int], n_classes: int,
                      mixed_precision: bool = False,
                      output_bias: Optional[np.ndarray] = None) -> C.ModelSpec:
    dtype = jnp.bfloat16 if mixed_precision else None
    full = mobilenetv2_backbone(input_size=tuple(input_shape[:2]), dtype=dtype)

    cutoff_idx = int(hparams.get("CUTOFF_IDX", len(full.layers) - 1))
    freeze_idx = int(hparams.get("FREEZE_IDX", -1))
    backbone = full.cut(cutoff_idx)

    graph, regs = C.classifier_head(
        backbone, n_classes=n_classes, dropout=float(hparams["DROPOUT"]),
        output_bias=output_bias, fc0_nodes=int(hparams["NODES_DENSE0"]),
        fc0_l2=float(hparams.get("L2_LAMBDA", 0.0)), double_dropout=True,
        dtype=dtype)

    phases = C.single_phase(graph, freeze_idx, float(hparams["LR"]),
                            backbone_len=len(backbone.layers))
    return C.ModelSpec(name="mobilenetv2", graph=graph, preprocess_mode="tf",
                       phases=phases, input_shape=tuple(input_shape),
                       n_classes=n_classes, activity_regularizers=regs)
