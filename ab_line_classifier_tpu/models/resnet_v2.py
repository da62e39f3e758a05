"""``custom_resnetv2`` — bottleneck pre-activation ResNetV2 (reference
``src/models/models.py:298-384`` built from ``residual_block`` in
``src/models/model_utils.py:45-76``).

Structure: an initial conv-first block (conv->BN->relu), then 3 stages of
BLOCKS bottleneck units in pre-activation order (BN->relu->conv), with a 1x1
projection shortcut on each stage's first unit, then SpatialDropout -> GAP ->
Dense-softmax. Stage 0 expands filters x4; stages 1-2 expand x2 and
downsample by stride 2 in their first unit.

The reference compiles this model with ``run_eagerly=True`` (models.py:383),
i.e. it trains uncompiled in TF — here it is jitted like everything else.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import numpy as np

from ab_line_classifier_tpu import graph as G
from ab_line_classifier_tpu.models import common as C


def _residual_chain(specs: List[G.LayerSpec], prefix: str, inp: str,
                    num_filters: int, stride: int = 1, kernel_size: int = 3,
                    activation: bool = True, bn: bool = True,
                    conv_first: bool = True, dtype=None) -> str:
    """Append one reference ``residual_block`` (model_utils.py:45-76):
    conv->bn->act when ``conv_first`` else bn->act->conv. Returns the name of
    the final node."""
    prev = inp
    if conv_first:
        specs.append(G.conv2d(f"{prefix}_conv", prev, num_filters,
                              (kernel_size, kernel_size),
                              strides=(stride, stride), padding="SAME",
                              dtype=dtype))
        prev = f"{prefix}_conv"
        if bn:
            specs.append(G.batch_norm(f"{prefix}_bn", prev, dtype=dtype))
            prev = f"{prefix}_bn"
        if activation:
            specs.append(G.relu(f"{prefix}_act", prev))
            prev = f"{prefix}_act"
    else:
        if bn:
            specs.append(G.batch_norm(f"{prefix}_bn", prev, dtype=dtype))
            prev = f"{prefix}_bn"
        if activation:
            specs.append(G.relu(f"{prefix}_act", prev))
            prev = f"{prefix}_act"
        specs.append(G.conv2d(f"{prefix}_conv", prev, num_filters,
                              (kernel_size, kernel_size),
                              strides=(stride, stride), padding="SAME",
                              dtype=dtype))
        prev = f"{prefix}_conv"
    return prev


def build_custom_resnetv2(hparams: Dict[str, Any],
                          input_shape: Tuple[int, int, int], n_classes: int,
                          mixed_precision: bool = False,
                          output_bias: Optional[np.ndarray] = None) -> C.ModelSpec:
    dtype = None
    if mixed_precision:
        import jax.numpy as jnp
        dtype = jnp.bfloat16

    num_filters_in = int(hparams.get("INIT_FILTERS", 16))
    num_res_block = int(hparams.get("BLOCKS", 2))
    dropout1 = float(hparams.get("DROPOUT1", 0.4))

    specs: List[G.LayerSpec] = []
    # ResNetV2 performs a conv-first block on the input before splitting
    # (reference models.py:322).
    x = _residual_chain(specs, "stem", G.INPUT, num_filters_in,
                        conv_first=True, dtype=dtype)

    for stage in range(3):
        for unit in range(num_res_block):
            activation = True
            bn = True
            stride = 1
            if stage == 0:
                num_filters_out = num_filters_in * 4
                if unit == 0:
                    activation = False
                    bn = False
            else:
                num_filters_out = num_filters_in * 2
                if unit == 0:
                    stride = 2

            p = f"stage{stage}_unit{unit}"
            y = _residual_chain(specs, f"{p}_a", x, num_filters_in,
                                kernel_size=1, stride=stride,
                                activation=activation, bn=bn,
                                conv_first=False, dtype=dtype)
            y = _residual_chain(specs, f"{p}_b", y, num_filters_in,
                                conv_first=False, dtype=dtype)
            y = _residual_chain(specs, f"{p}_c", y, num_filters_out,
                                kernel_size=1, conv_first=False, dtype=dtype)
            if unit == 0:
                # Linear projection shortcut to match changed dims
                # (reference models.py:360-369).
                x = _residual_chain(specs, f"{p}_proj", x, num_filters_out,
                                    kernel_size=1, stride=stride,
                                    activation=False, bn=False,
                                    conv_first=True, dtype=dtype)
            specs.append(G.add(f"{p}_add", x, y))
            x = f"{p}_add"
        num_filters_in = num_filters_out

    # Head: SpatialDropout2D -> GAP -> Dense-softmax (reference
    # models.py:374-376). SpatialDropout drops whole channels, i.e. dropout
    # broadcast over the spatial dims.
    specs.append(G.LayerSpec(
        name="spatial_dropout", kind=G.KIND_DROPOUT, inputs=(x,),
        module_fn=lambda name: nn.Dropout(rate=dropout1, name=name,
                                          broadcast_dims=(1, 2))))
    specs.append(G.global_avg_pool("global_avgpool", "spatial_dropout"))
    specs.append(G.dense("logits", "global_avgpool", n_classes,
                         bias_init=C.output_bias_init(output_bias),
                         dtype=dtype))
    specs.append(G.softmax("output", "logits"))

    graph = G.graph_of(*specs, output="output")
    # The reference custom_resnetv2 never calls freeze_layers
    # (models.py:298-384): its BN layers train and update statistics.
    phases = C.single_phase(graph, -1, float(hparams["LR"]),
                            freeze_bn=False)
    return C.ModelSpec(name="custom_resnetv2", graph=graph,
                       preprocess_mode="tf", phases=phases,
                       input_shape=tuple(input_shape), n_classes=n_classes)
