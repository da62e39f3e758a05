"""VGG16 family: full ``vgg16`` classifier and the production ``cutoffvgg16``.

Reference semantics being preserved:

* ``vgg16`` — ImageNet-style VGG16 conv backbone + GAP/Dropout/Dense-softmax
  head with FREEZE_IDX layer freezing (reference ``src/models/models.py:102-151``).
* ``cutoffvgg16`` — VGG16 layers ``[1:CUTOFF_LAYER]`` (i.e. through
  block3_conv3 at the default CUTOFF_LAYER=10) + GAP/Dropout/softmax-Dense,
  trained in two phases: feature-extract (backbone frozen, Adam @ LR_EXTRACT,
  EXTRACT_EPOCHS) then fine-tune (backbone layers >= FINETUNE_LAYER unfrozen,
  RMSprop @ LR_FINETUNE) (reference ``models.py:387-434``).

Keras layer numbering of VGG16 (include_top=False), which CUTOFF_LAYER /
FINETUNE_LAYER index into: 0=input, 1=block1_conv1, 2=block1_conv2,
3=block1_pool, 4=block2_conv1, 5=block2_conv2, 6=block2_pool, 7=block3_conv1,
8=block3_conv2, 9=block3_conv3, 10=block3_pool, 11..13=block4 convs,
14=block4_pool, 15..17=block5 convs, 18=block5_pool.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import numpy as np

from ab_line_classifier_tpu import graph as G
from ab_line_classifier_tpu.models import common as C

# (n_convs, filters) per VGG16 block.
VGG16_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def vgg16_backbone(dtype=None) -> G.LayerGraph:
    """Full VGG16 conv stack with Keras layer names and ordering."""
    specs = []
    prev = G.INPUT
    for b, (n_convs, filters) in enumerate(VGG16_BLOCKS, start=1):
        for c in range(1, n_convs + 1):
            name = f"block{b}_conv{c}"
            specs.append(G.conv2d(name, prev, filters, (3, 3), act=nn.relu,
                                  dtype=dtype))
            prev = name
        pool = f"block{b}_pool"
        specs.append(G.max_pool(pool, prev, (2, 2)))
        prev = pool
    return G.graph_of(*specs)


def build_vgg16(hparams: Dict[str, Any], input_shape: Tuple[int, int, int],
                n_classes: int, mixed_precision: bool = False,
                output_bias: Optional[np.ndarray] = None) -> C.ModelSpec:
    """The ``vgg16`` zoo entry (reference models.py:102-151): full backbone,
    FREEZE_IDX freezing, GAP -> Dropout -> Dense(n_classes) -> softmax head.
    (The reference defines NODES_DENSE0 for VGG16 but its head never uses it.)
    """
    dtype = None
    if mixed_precision:
        import jax.numpy as jnp
        dtype = jnp.bfloat16
    backbone = vgg16_backbone(dtype=dtype)
    graph, regs = C.classifier_head(
        backbone, n_classes=n_classes, dropout=float(hparams["DROPOUT"]),
        output_bias=output_bias, dtype=dtype)
    phases = C.single_phase(graph, int(hparams.get("FREEZE_IDX", -1)),
                            float(hparams["LR"]),
                            backbone_len=len(backbone.layers))
    return C.ModelSpec(name="vgg16", graph=graph, preprocess_mode="caffe",
                       phases=phases, input_shape=tuple(input_shape),
                       n_classes=n_classes, activity_regularizers=regs)


def build_cutoffvgg16(hparams: Dict[str, Any], input_shape: Tuple[int, int, int],
                      n_classes: int, mixed_precision: bool = False,
                      output_bias: Optional[np.ndarray] = None,
                      total_epochs: Optional[int] = None) -> C.ModelSpec:
    """The production ``cutoffvgg16`` (reference models.py:387-434)."""
    dtype = None
    if mixed_precision:
        import jax.numpy as jnp
        dtype = jnp.bfloat16

    cutoff_layer = int(hparams.get("CUTOFF_LAYER", 10))
    finetune_layer = int(hparams.get("FINETUNE_LAYER", 7))
    extract_epochs = int(hparams.get("EXTRACT_EPOCHS", 6))
    lr_extract = float(hparams.get("LR_EXTRACT", 3e-4))
    lr_finetune = float(hparams.get("LR_FINETUNE", 9.3e-6))
    dropout = float(hparams.get("DROPOUT", 0.45))

    full = vgg16_backbone(dtype=dtype)
    # Keras slices vgg16.layers[1:cutoff_layer]; with our input node at index
    # 0 that keeps graph indices 1..cutoff_layer-1.
    backbone = full.cut(cutoff_layer - 1)
    backbone_layers = [s.name for s in backbone.layers[1:]]  # keras list [1:cutoff]

    graph, regs = C.classifier_head(
        backbone, n_classes=n_classes, dropout=dropout,
        output_bias=output_bias, dtype=dtype)

    backbone_param_layers = [n for n in backbone_layers
                             if graph[n].has_params]

    # Phase 1 (feature extraction): every backbone layer frozen, head trains
    # with Adam @ LR_EXTRACT (reference models.py:424-428).
    extract_trainable = {n: True for n in graph.param_layer_names()}
    for n in backbone_param_layers:
        extract_trainable[n] = False

    # Phase 2 (fine-tune): backbone layers with *list index* >= FINETUNE_LAYER
    # in the sliced layer list become trainable; RMSprop @ LR_FINETUNE
    # (reference models.py:429-434).
    finetune_trainable = {n: True for n in graph.param_layer_names()}
    for i, n in enumerate(backbone_layers):
        if graph[n].has_params:
            finetune_trainable[n] = i >= finetune_layer

    # Keras runs phase 2 with epochs=EPOCHS, initial_epoch=EXTRACT_EPOCHS-1,
    # i.e. EPOCHS - EXTRACT_EPOCHS + 1 additional epochs.
    finetune_epochs = None
    if total_epochs is not None:
        finetune_epochs = max(0, int(total_epochs) - extract_epochs + 1)

    phases = (
        C.TrainPhase(name="extract", optimizer="adam", lr=lr_extract,
                     trainable=extract_trainable, epochs=extract_epochs),
        C.TrainPhase(name="finetune", optimizer="rmsprop", lr=lr_finetune,
                     trainable=finetune_trainable, epochs=finetune_epochs),
    )

    return C.ModelSpec(name="cutoffvgg16", graph=graph,
                       preprocess_mode="caffe", phases=phases,
                       input_shape=tuple(input_shape), n_classes=n_classes,
                       activity_regularizers=regs)
