"""Shared model-zoo infrastructure: ModelSpec, training phases, heads.

A :class:`ModelSpec` is the framework's answer to the reference's
``model_def(hparams, input_shape, metrics, n_classes, ...) -> compiled Model``
contract (reference ``src/models/models.py:51-100`` etc.): it bundles the layer
graph, the preprocessing mode, the optimizer plan (one phase for most models,
two for CutoffVGG16's extract->finetune schedule, reference
``models.py:423-434``), per-layer trainability, and activity regularizers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ab_line_classifier_tpu import graph as G


def _scale_by_keras_adam(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam moment scaling with Keras's exact epsilon placement
    (keras/src/optimizers/adam.py update_step):

        var -= m * (lr * sqrt(1-b2^t)/(1-b1^t)) / (sqrt(v) + eps)

    i.e. eps is added to sqrt of the UNCORRECTED second moment. Optax's
    adam adds eps to sqrt(v_hat) instead, which diverges on near-zero
    gradient components early in training (verified by the one-step
    training-parity test)."""
    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree.map(
            lambda m, v: (m * alpha / (jnp.sqrt(v) + eps)).astype(m.dtype),
            mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _keras_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-7) -> optax.GradientTransformation:
    """Keras-exact Adam (defaults b1=0.9, b2=0.999, epsilon=1e-7)."""
    return optax.chain(_scale_by_keras_adam(b1, b2, eps),
                       optax.scale_by_learning_rate(learning_rate))


@dataclasses.dataclass(frozen=True)
class TrainPhase:
    """One stage of the optimizer plan.

    ``epochs`` is the number of epochs this phase runs (None = all remaining).
    ``trainable`` maps parameterized layer name -> bool; frozen layers get
    zero updates (their state is carried but untouched).
    """

    name: str
    optimizer: str               # 'adam' | 'rmsprop' | 'sgd'
    lr: float
    trainable: Dict[str, bool]
    epochs: Optional[int] = None

    def make_tx(self) -> optax.GradientTransformation:
        """Optimizer with the trainability mask applied (frozen layers get
        ``set_to_zero``) — the functional equivalent of Keras
        ``layer.trainable = False`` + recompile (reference models.py:424-431).

        The learning rate is injected as a runtime hyperparameter
        (``optax.inject_hyperparams``) so ReduceLROnPlateau can halve it
        *in-place in the optimizer state* without retracing the train step —
        the jitted program never changes shape.
        """
        label_of = {name: ("train" if t else "freeze")
                    for name, t in self.trainable.items()}

        def labels(params):
            return {k: label_of.get(k, "train") for k in params}

        if self.optimizer == "adam":
            base = optax.inject_hyperparams(_keras_adam)(
                learning_rate=self.lr)
        elif self.optimizer == "rmsprop":
            # Keras RMSprop defaults: rho=0.9, eps=1e-7, no momentum. The
            # reference pins TF 2.9 (requirements.txt:13), whose update is
            # lr * g / (sqrt(v) + eps) — epsilon OUTSIDE the sqrt
            # (tf 2.9 optimizer_v2/rmsprop.py dense path; Keras 3 later
            # moved it inside). Follow the pinned reference semantics:
            # eps placement matters exactly where finetune gradients are
            # tiny (v << eps), the regime LR_FINETUNE=9.3e-6 lives in.
            base = optax.inject_hyperparams(optax.rmsprop)(
                learning_rate=self.lr, decay=0.9, eps=1e-7,
                eps_in_sqrt=False)
        elif self.optimizer == "sgd":
            base = optax.inject_hyperparams(optax.sgd)(learning_rate=self.lr)
        else:
            raise ValueError(f"unknown optimizer {self.optimizer!r}")

        return optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels)


def scale_learning_rate(opt_state, factor: float):
    """Multiply every injected ``learning_rate`` hyperparameter in an
    optimizer state pytree (ReduceLROnPlateau's in-place halving)."""
    def fn(path, leaf):
        if any(getattr(k, "key", None) == "learning_rate" for k in path):
            return leaf * factor
        return leaf
    return jax.tree_util.tree_map_with_path(fn, opt_state)


def get_learning_rate(opt_state) -> Optional[float]:
    """Read the current injected learning rate (first one found)."""
    found = []

    def fn(path, leaf):
        if any(getattr(k, "key", None) == "learning_rate" for k in path):
            found.append(leaf)
        return leaf
    jax.tree_util.tree_map_with_path(fn, opt_state)
    return float(found[0]) if found else None


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """A fully-specified zoo model."""

    name: str
    graph: G.LayerGraph
    preprocess_mode: str
    phases: Tuple[TrainPhase, ...]
    input_shape: Tuple[int, int, int]
    n_classes: int
    # layer name -> l2 lambda for activity regularization (reference applies
    # keras ``activity_regularizer=l2(...)`` on dense layers, models.py:89,286).
    activity_regularizers: Dict[str, float] = dataclasses.field(default_factory=dict)
    logits_layer: str = "logits"
    output_layer: str = "output"

    def module(self, capture: Tuple[str, ...] = (),
               inference_bn: Tuple[str, ...] = ()) -> G.GraphModule:
        return G.GraphModule(graph=self.graph, capture=capture,
                             inference_bn=inference_bn)

    def logits_module(self, capture: Tuple[str, ...] = (),
                      inference_bn: Tuple[str, ...] = ()) -> G.GraphModule:
        """Module whose output is the pre-softmax logits (loss is computed
        from logits for numerical stability; the reference trains on softmax
        probabilities with categorical_crossentropy)."""
        g = dataclasses.replace(self.graph, output=self.logits_layer)
        return G.GraphModule(graph=g, capture=capture,
                             inference_bn=inference_bn)

    def frozen_bn_layers(self, phase: TrainPhase) -> Tuple[str, ...]:
        """BN layers frozen in this phase: Keras trainable=False BN runs in
        inference mode during training and never updates its moving stats
        (the reference's freeze_layers freezes every BN whenever called,
        model_utils.py:26-41)."""
        return tuple(
            s.name for s in self.graph.layers
            if s.kind == G.KIND_BN and not phase.trainable.get(s.name, True))

    def init_variables(self, rng: jax.Array, batch_size: int = 1):
        module = self.module()
        x = jnp.zeros((batch_size,) + tuple(self.input_shape), jnp.float32)
        return module.init({"params": rng, "dropout": rng}, x, train=False)

    @property
    def last_conv_layer(self) -> str:
        """Last conv-like layer for Grad-CAM. The reference scans keras api
        names for 'Conv' (gradcam.py:33-38), which matches Conv2D,
        SeparableConv2D AND DepthwiseConv2D — so depthwise nodes count."""
        return self.graph.last_layer_of_kind(G.KIND_CONV, G.KIND_DEPTHWISE)


def output_bias_init(output_bias: Optional[np.ndarray]) -> Optional[Callable]:
    """Keras ``bias_initializer=Constant(log_odds)`` equivalent (reference
    train.py:71-81 computes the log-odds prior; models pass it to the final
    Dense, e.g. models.py:91)."""
    if output_bias is None:
        return None
    arr = np.asarray(output_bias, dtype=np.float32)

    def init(key, shape, dtype=jnp.float32):
        return jnp.broadcast_to(jnp.asarray(arr, dtype), shape).astype(dtype)

    return init


def correct_pad(size: Tuple[int, int], kernel: int):
    """Keras ``imagenet_utils.correct_pad``: explicit zero padding for a
    stride-2 VALID conv so the output is ``ceil(size/2)`` (shared by the
    MobileNetV2 and EfficientNet backbones)."""
    adjust = (1 - size[0] % 2, 1 - size[1] % 2)
    correct = kernel // 2
    return ((correct - adjust[0], correct), (correct - adjust[1], correct))


def stride2_out(size: Tuple[int, int]) -> Tuple[int, int]:
    """Spatial size after a correct_pad + stride-2 VALID conv: ceil(s/2)
    for BOTH parities (floor would drift on odd sizes and desync every
    later correct_pad from the real tensor)."""
    return ((size[0] + 1) // 2, (size[1] + 1) // 2)


def he_uniform():
    return jax.nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def glorot_uniform():
    return jax.nn.initializers.glorot_uniform()


def classifier_head(
    backbone: G.LayerGraph,
    *,
    n_classes: int,
    dropout: float,
    output_bias: Optional[np.ndarray] = None,
    fc0_nodes: Optional[int] = None,
    fc0_l2: float = 0.0,
    fc0_kernel_init: Optional[Callable] = None,
    double_dropout: bool = False,
    dtype=None,
) -> Tuple[G.LayerGraph, Dict[str, float]]:
    """Append the standard head the reference puts on every backbone:
    GAP -> Dropout [-> Dense(fc0, relu) (-> Dropout)] -> Dense(n_classes) ->
    softmax (reference models.py:87-92 for the fc0 variant, :140-143 without).

    Returns the new graph and the activity-regularizer map.
    """
    src = backbone.output
    specs: List[G.LayerSpec] = []
    activity_regs: Dict[str, float] = {}

    specs.append(G.global_avg_pool("global_avgpool", src))
    specs.append(G.dropout("dropout_head", "global_avgpool", dropout))
    prev = "dropout_head"

    if fc0_nodes:
        # ONE node with a fused relu, like Keras Dense(activation='relu',
        # name='fc0') — name/index parity for h5 import (models.py:88,286).
        specs.append(G.dense("fc0", prev, fc0_nodes, act=nn.relu,
                             kernel_init=fc0_kernel_init, dtype=dtype))
        if fc0_l2:
            activity_regs["fc0"] = fc0_l2
        prev = "fc0"
        if double_dropout:
            specs.append(G.dropout("dropout_head1", prev, dropout))
            prev = "dropout_head1"

    specs.append(G.dense("logits", prev, n_classes,
                         bias_init=output_bias_init(output_bias), dtype=dtype))
    specs.append(G.softmax("output", "logits"))

    return backbone.append(specs, output="output"), activity_regs


def single_phase(graph: G.LayerGraph, freeze_idx: int, lr: float,
                 optimizer: str = "adam",
                 freeze_bn: bool = True,
                 backbone_len: Optional[int] = None) -> Tuple[TrainPhase, ...]:
    """The one-phase Adam plan used by every model except CutoffVGG16
    (reference models.py compiles each with ``Adam(learning_rate=lr)``).

    ``freeze_bn=True`` mirrors ``freeze_layers``'s always-freeze-BN behavior
    and applies only to models whose reference builder calls it (mobilenetv2
    models.py:82, vgg16 :135, efficientnetb7 :229); xception/cnn0/
    custom_resnetv2 never freeze, so their BN trains (pass False).
    ``backbone_len`` scopes the freeze to the backbone, matching the
    reference's ``freeze_layers(base_model, ...)`` — see
    ``LayerGraph.trainable_mask``."""
    return (TrainPhase(name="train", optimizer=optimizer, lr=lr,
                       trainable=graph.trainable_mask(
                           freeze_idx, freeze_bn_always=freeze_bn,
                           backbone_len=backbone_len)),)
