"""Xception (reference ``src/models/models.py:153-196``): full Keras Xception
backbone + GAP/Dropout/Dense-softmax head. Layer names AND indices match Keras
exactly (verified in tests/test_keras_parity.py), including Keras's auto-names
for the residual-projection convs (``conv2d``..``conv2d_3``,
``batch_normalization``..``_3``) and the merge nodes (``add``..``add_11``),
and Keras's layer ordering (residual conv/BN interleaved *after* the block's
sepconvs) — so CUTOFF/FREEZE indices and h5 weight import line up 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ab_line_classifier_tpu import graph as G
from ab_line_classifier_tpu.models import common as C


def xception_backbone(dtype=None) -> G.LayerGraph:
    specs: List[G.LayerSpec] = []

    # Entry flow, stem (VALID padding, as in Keras).
    specs.append(G.conv2d("block1_conv1", G.INPUT, 32, (3, 3), strides=(2, 2),
                          padding="VALID", use_bias=False, dtype=dtype))
    specs.append(G.batch_norm("block1_conv1_bn", "block1_conv1", dtype=dtype))
    specs.append(G.relu("block1_conv1_act", "block1_conv1_bn"))
    specs.append(G.conv2d("block1_conv2", "block1_conv1_act", 64, (3, 3),
                          padding="VALID", use_bias=False, dtype=dtype))
    specs.append(G.batch_norm("block1_conv2_bn", "block1_conv2", dtype=dtype))
    specs.append(G.relu("block1_conv2_act", "block1_conv2_bn"))
    prev = "block1_conv2_act"

    def res_block(prev: str, block: int, filters: int, first_act: bool,
                  res_idx: int) -> str:
        """Down-sampling residual block in Keras layer order: sepconvs first,
        then the auto-named residual 1x1 conv (``conv2d_{i}``) interleaved
        between the pool's definition and the BN/add."""
        b = f"block{block}"
        res_conv = "conv2d" if res_idx == 0 else f"conv2d_{res_idx}"
        res_bn = ("batch_normalization" if res_idx == 0
                  else f"batch_normalization_{res_idx}")
        merge = "add" if res_idx == 0 else f"add_{res_idx}"
        x = prev
        if first_act:
            specs.append(G.relu(f"{b}_sepconv1_act", x))
            x = f"{b}_sepconv1_act"
        specs.append(G.separable_conv2d(f"{b}_sepconv1", x, filters, (3, 3),
                                        use_bias=False, dtype=dtype))
        specs.append(G.batch_norm(f"{b}_sepconv1_bn", f"{b}_sepconv1",
                                  dtype=dtype))
        specs.append(G.relu(f"{b}_sepconv2_act", f"{b}_sepconv1_bn"))
        specs.append(G.separable_conv2d(f"{b}_sepconv2", f"{b}_sepconv2_act",
                                        filters, (3, 3), use_bias=False,
                                        dtype=dtype))
        specs.append(G.batch_norm(f"{b}_sepconv2_bn", f"{b}_sepconv2",
                                  dtype=dtype))
        specs.append(G.conv2d(res_conv, prev, filters, (1, 1),
                              strides=(2, 2), padding="SAME", use_bias=False,
                              dtype=dtype))
        specs.append(G.max_pool(f"{b}_pool", f"{b}_sepconv2_bn", (3, 3),
                                strides=(2, 2), padding="SAME"))
        specs.append(G.batch_norm(res_bn, res_conv, dtype=dtype))
        specs.append(G.add(merge, f"{b}_pool", res_bn))
        return merge

    prev = res_block(prev, 2, 128, first_act=False, res_idx=0)
    prev = res_block(prev, 3, 256, first_act=True, res_idx=1)
    prev = res_block(prev, 4, 728, first_act=True, res_idx=2)

    # Middle flow: 8 identity-residual triple-sepconv blocks
    # (merge nodes add_3 .. add_10 in Keras's auto-numbering).
    for block in range(5, 13):
        b = f"block{block}"
        x = prev
        for j in (1, 2, 3):
            specs.append(G.relu(f"{b}_sepconv{j}_act", x))
            specs.append(G.separable_conv2d(f"{b}_sepconv{j}",
                                            f"{b}_sepconv{j}_act", 728, (3, 3),
                                            use_bias=False, dtype=dtype))
            specs.append(G.batch_norm(f"{b}_sepconv{j}_bn", f"{b}_sepconv{j}",
                                      dtype=dtype))
            x = f"{b}_sepconv{j}_bn"
        specs.append(G.add(f"add_{block - 2}", prev, x))
        prev = f"add_{block - 2}"

    # Exit flow (residual conv2d_3 / batch_normalization_3 / add_11).
    specs.append(G.relu("block13_sepconv1_act", prev))
    specs.append(G.separable_conv2d("block13_sepconv1", "block13_sepconv1_act",
                                    728, (3, 3), use_bias=False, dtype=dtype))
    specs.append(G.batch_norm("block13_sepconv1_bn", "block13_sepconv1",
                              dtype=dtype))
    specs.append(G.relu("block13_sepconv2_act", "block13_sepconv1_bn"))
    specs.append(G.separable_conv2d("block13_sepconv2", "block13_sepconv2_act",
                                    1024, (3, 3), use_bias=False, dtype=dtype))
    specs.append(G.batch_norm("block13_sepconv2_bn", "block13_sepconv2",
                              dtype=dtype))
    specs.append(G.conv2d("conv2d_3", prev, 1024, (1, 1),
                          strides=(2, 2), padding="SAME", use_bias=False,
                          dtype=dtype))
    specs.append(G.max_pool("block13_pool", "block13_sepconv2_bn", (3, 3),
                            strides=(2, 2), padding="SAME"))
    specs.append(G.batch_norm("batch_normalization_3", "conv2d_3",
                              dtype=dtype))
    specs.append(G.add("add_11", "block13_pool", "batch_normalization_3"))

    specs.append(G.separable_conv2d("block14_sepconv1", "add_11", 1536,
                                    (3, 3), use_bias=False, dtype=dtype))
    specs.append(G.batch_norm("block14_sepconv1_bn", "block14_sepconv1",
                              dtype=dtype))
    specs.append(G.relu("block14_sepconv1_act", "block14_sepconv1_bn"))
    specs.append(G.separable_conv2d("block14_sepconv2", "block14_sepconv1_act",
                                    2048, (3, 3), use_bias=False, dtype=dtype))
    specs.append(G.batch_norm("block14_sepconv2_bn", "block14_sepconv2",
                              dtype=dtype))
    specs.append(G.relu("block14_sepconv2_act", "block14_sepconv2_bn"))

    return G.graph_of(*specs)


def build_xception(hparams: Dict[str, Any],
                   input_shape: Tuple[int, int, int], n_classes: int,
                   mixed_precision: bool = False,
                   output_bias: Optional[np.ndarray] = None) -> C.ModelSpec:
    dtype = jnp.bfloat16 if mixed_precision else None
    backbone = xception_backbone(dtype=dtype)
    graph, regs = C.classifier_head(
        backbone, n_classes=n_classes, dropout=float(hparams["DROPOUT"]),
        output_bias=output_bias, dtype=dtype)
    # The reference builder never freezes Xception layers (models.py:153-196).
    phases = C.single_phase(graph, -1, float(hparams["LR"]),
                            freeze_bn=False)
    return C.ModelSpec(name="xception", graph=graph, preprocess_mode="tf",
                       phases=phases, input_shape=tuple(input_shape),
                       n_classes=n_classes, activity_regularizers=regs)
