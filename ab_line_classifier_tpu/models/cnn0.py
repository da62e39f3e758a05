"""``cnn0`` — the from-scratch conv-block CNN (reference
``src/models/models.py:248-296``): ZeroPad -> [Conv(relu)+BN+MaxPool]*blocks
-> GAP -> Dropout -> Dense(relu) -> Dense -> softmax.

Differences from the reference, on purpose:
* the reference ``eval()``s KERNEL_SIZE/STRIDES/MAXPOOL_SIZE config strings and
  crashes on the shipped integer config values (models.py:258-260) — here ints
  and [h, w] pairs are both accepted;
* the reference reads FILTER_EXP_BASE but hardcodes base 2 (models.py:276) —
  here the config value is honored (its default is 2).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import numpy as np

from ab_line_classifier_tpu import graph as G
from ab_line_classifier_tpu.models import common as C


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (list, tuple)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def build_cnn0(hparams: Dict[str, Any], input_shape: Tuple[int, int, int],
               n_classes: int, mixed_precision: bool = False,
               output_bias: Optional[np.ndarray] = None) -> C.ModelSpec:
    dtype = None
    if mixed_precision:
        import jax.numpy as jnp
        dtype = jnp.bfloat16

    kernel = _pair(hparams.get("KERNEL_SIZE", 3))
    strides = _pair(hparams.get("STRIDES", 1))
    pool = _pair(hparams.get("MAXPOOL_SIZE", 2))
    n_blocks = int(hparams.get("BLOCKS", 4))
    init_filters = int(hparams.get("INIT_FILTERS", 32))
    base = float(hparams.get("FILTER_EXP_BASE", 2))
    l2_lambda = float(hparams.get("L2_LAMBDA", 0.0))
    dropout = float(hparams.get("DROPOUT", 0.35))
    fc0_nodes = int(hparams.get("NODES_DENSE0", 64))
    pad = kernel[0] // 2

    specs = []
    specs.append(G.zero_pad("zero_padding", G.INPUT, ((pad, pad), (pad, pad))))
    prev = "zero_padding"
    regs: Dict[str, float] = {}
    for i in range(n_blocks):
        filters = int(init_filters * (base ** i))
        conv = f"conv2d_block{i}_0"
        specs.append(G.conv2d(conv, prev, filters, kernel, strides=strides,
                              padding="SAME", kernel_init=C.he_uniform(),
                              act=nn.relu, dtype=dtype))
        if l2_lambda:
            regs[conv] = l2_lambda
        bn = f"bn_block{i}"
        specs.append(G.batch_norm(bn, conv, dtype=dtype))
        prev = bn
        if i < n_blocks - 1:
            mp = f"maxpool{i}"
            specs.append(G.max_pool(mp, prev, pool, padding="SAME"))
            prev = mp

    backbone = G.graph_of(*specs)
    graph, head_regs = C.classifier_head(
        backbone, n_classes=n_classes, dropout=dropout,
        output_bias=output_bias, fc0_nodes=fc0_nodes, fc0_l2=l2_lambda,
        fc0_kernel_init=C.he_uniform(), dtype=dtype)
    regs.update(head_regs)

    # The reference cnn0 never calls freeze_layers (models.py:248-296):
    # its BN layers train and update statistics.
    phases = C.single_phase(graph, -1, float(hparams["LR"]),
                            freeze_bn=False)
    return C.ModelSpec(name="cnn0", graph=graph, preprocess_mode="tf",
                       phases=phases, input_shape=tuple(input_shape),
                       n_classes=n_classes, activity_regularizers=regs)
