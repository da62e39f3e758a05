"""Layer-graph IR: the framework's model graph-builder.

The reference manipulates Keras models *by layer index*: it cuts a backbone at
``CUTOFF_IDX`` (``Model(base.input, base.layers[cutoff_idx].output)``,
reference ``src/models/models.py:79``), freezes layers up to ``FREEZE_IDX``
(reference ``src/models/model_utils.py:26-41``), slices VGG16's layer list for
CutoffVGG16 (``vgg16.layers[1:cutoff_layer]``, ``models.py:410``), and finds
the last convolution for Grad-CAM by scanning the layer list (reference
``src/explainability/gradcam.py:33-38``).

To support those semantics natively — without a Keras dependency and without
giving up XLA-friendly functional models — models here are built as an explicit
DAG of named :class:`LayerSpec` nodes in Keras topological order (node index 0
is the input node, matching ``keras.Model.layers`` numbering). The DAG is a
*static* Python structure: executing it traces straight-line XLA code, so jit
sees one fused program. On top of the IR:

* :meth:`LayerGraph.cut` — truncate at a layer index/name (CUTOFF_IDX).
* :meth:`LayerGraph.trainable_mask` — per-layer trainability (FREEZE_IDX).
* :meth:`LayerGraph.last_layer_of_kind` — e.g. the Grad-CAM conv tap.
* :class:`GraphModule` — a Flax module executing the DAG, optionally
  capturing named intermediate activations in the same compiled pass
  (this is what makes fused Grad-CAM a one-program affair).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

INPUT = "__input__"

# Layer kinds with special call conventions or freeze semantics.
KIND_CONV = "conv"
KIND_DEPTHWISE = "depthwise"
KIND_BN = "bn"
KIND_DENSE = "dense"
KIND_DROPOUT = "dropout"
KIND_FN = "fn"  # pure function of its inputs (activation, pool, add, pad...)
KIND_NORM = "norm"  # keras Normalization: fixed (x-mean)/sqrt(var) stats


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One node of the model DAG.

    Exactly one of ``module_fn`` / ``fn`` is set. ``module_fn`` is a zero-arg
    factory returning a Flax module (called with ``name=spec.name`` so the
    parameter tree is flat and keyed by layer name, mirroring Keras layer
    names). ``fn`` is a pure function of the input activations.
    """

    name: str
    kind: str
    inputs: Tuple[str, ...]
    module_fn: Optional[Callable[..., nn.Module]] = None
    fn: Optional[Callable[..., Any]] = None
    # Applied to the module's output within the same node — models a Keras
    # layer with a fused activation (e.g. Conv2D(activation='relu') in VGG16),
    # which must stay ONE layer for index parity.
    post_fn: Optional[Callable[..., Any]] = None

    @property
    def has_params(self) -> bool:
        return self.module_fn is not None and self.kind != KIND_DROPOUT


class GraphError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class LayerGraph:
    """A topologically-ordered DAG of layers. Index 0 is the input node."""

    layers: Tuple[LayerSpec, ...]
    output: str = ""  # defaults to last layer

    def __post_init__(self):
        if not self.layers or self.layers[0].name != INPUT:
            raise GraphError("graph must start with the input node")
        seen = set()
        for spec in self.layers:
            for inp in spec.inputs:
                if inp not in seen:
                    raise GraphError(
                        f"layer {spec.name!r} consumes {inp!r} before it is produced"
                    )
            if spec.name in seen:
                raise GraphError(f"duplicate layer name {spec.name!r}")
            seen.add(spec.name)
        out = self.output or self.layers[-1].name
        if out not in seen:
            raise GraphError(f"output node {out!r} not in graph")
        object.__setattr__(self, "output", out)

    # Lookup ---------------------------------------------------------------
    def index_of(self, name: str) -> int:
        for i, spec in enumerate(self.layers):
            if spec.name == name:
                return i
        raise GraphError(f"no layer named {name!r}")

    def __getitem__(self, key) -> LayerSpec:
        if isinstance(key, str):
            return self.layers[self.index_of(key)]
        return self.layers[key]

    @property
    def layer_names(self) -> List[str]:
        return [s.name for s in self.layers]

    def last_layer_of_kind(self, *kinds: str) -> str:
        """Name of the last layer whose kind is one of ``kinds`` (Grad-CAM
        conv tap, reference ``gradcam.py:33-38`` scans for the last 'Conv'
        layer — which matches Conv2D, SeparableConv2D AND DepthwiseConv2D)."""
        for spec in reversed(self.layers):
            if spec.kind in kinds:
                return spec.name
        raise GraphError(f"graph has no layer of kind {kinds!r}")

    # Transformations ------------------------------------------------------
    def cut(self, at) -> "LayerGraph":
        """Truncate the graph so that layer ``at`` (index or name, Keras
        numbering with the input node at 0) becomes the output — the analogue
        of ``Model(base.input, base.layers[idx].output)``."""
        idx = self.index_of(at) if isinstance(at, str) else (
            at if at >= 0 else len(self.layers) + at
        )
        if idx <= 0:
            raise GraphError("cannot cut at the input node")
        if idx >= len(self.layers):
            # Keras raises IndexError on base.layers[idx] (reference
            # models.py:79); silently returning the full graph would train
            # the wrong architecture on a CUTOFF_IDX typo.
            raise GraphError(
                f"cut index {at} out of range for a {len(self.layers)}-layer "
                f"graph")
        keep = self.layers[: idx + 1]
        # Drop any kept layer whose inputs were themselves dropped (cannot
        # happen in topo order) and verify closure.
        names = {s.name for s in keep}
        for spec in keep[1:]:
            for inp in spec.inputs:
                if inp not in names:
                    raise GraphError(
                        f"cut at {at!r} severs input {inp!r} of {spec.name!r}"
                    )
        return LayerGraph(layers=keep, output=keep[-1].name)

    def append(self, specs: Sequence[LayerSpec], output: Optional[str] = None) -> "LayerGraph":
        """New graph with ``specs`` appended (a classification head, say)."""
        return LayerGraph(layers=self.layers + tuple(specs),
                         output=output or specs[-1].name)

    def trainable_mask(self, freeze_idx: int,
                       freeze_bn_always: bool = True,
                       backbone_len: Optional[int] = None) -> Dict[str, bool]:
        """Keras ``freeze_layers`` semantics (reference model_utils.py:26-41):
        layers with index <= freeze_idx are frozen; BatchNorm layers are frozen
        at any index. ``freeze_idx < 0`` freezes nothing by index (the
        reference passes -1 to mean 'train everything').

        ``backbone_len`` scopes freezing to the first N layers: the
        reference applies ``freeze_layers`` to the BACKBONE model before
        the head is attached (e.g. models.py:82), so a FREEZE_IDX at or
        past the cutoff must never freeze head layers — without the scope,
        this graph (backbone + head in one index space) would zero head
        updates Keras trains."""
        mask: Dict[str, bool] = {}
        limit = len(self.layers) if backbone_len is None else backbone_len
        for i, spec in enumerate(self.layers):
            if not spec.has_params:
                continue
            trainable = True
            if i < limit:
                if freeze_idx >= 0 and i <= freeze_idx:
                    trainable = False
                if freeze_bn_always and spec.kind == KIND_BN:
                    trainable = False
            mask[spec.name] = trainable
        return mask

    def param_layer_names(self) -> List[str]:
        return [s.name for s in self.layers if s.has_params]


class GraphModule(nn.Module):
    """Flax module executing a :class:`LayerGraph`.

    ``capture`` requests intermediate activations by layer name; they are
    returned alongside the output from the *same* traced program, which is how
    Grad-CAM gets the last-conv activation without a second forward pass.
    """

    graph: LayerGraph
    capture: Tuple[str, ...] = ()
    # BN layers to run in inference mode even during training. Keras BN with
    # ``trainable=False`` (the reference freezes every BN via freeze_layers,
    # model_utils.py:26-41) normalizes with its moving statistics and never
    # updates them; listing those layers here reproduces that.
    inference_bn: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 overrides: Optional[Dict[str, Any]] = None):
        """``overrides`` injects activations by layer name: the node's
        computation is skipped and the given array used instead. This is how
        Grad-CAM differentiates the output w.r.t. an intermediate activation
        inside one compiled program (``jax.vjp`` over the injected value);
        upstream work not needed by any downstream consumer is dead-code
        eliminated by XLA."""
        acts: Dict[str, Any] = {INPUT: x}
        overrides = overrides or {}
        for spec in self.graph.layers[1:]:
            if spec.name in overrides:
                acts[spec.name] = overrides[spec.name]
                continue
            ins = [acts[n] for n in spec.inputs]
            if spec.module_fn is not None:
                mod = spec.module_fn(name=spec.name)
                if spec.kind == KIND_BN:
                    frozen = spec.name in self.inference_bn
                    y = mod(ins[0],
                            use_running_average=(not train) or frozen)
                elif spec.kind == KIND_DROPOUT:
                    y = mod(ins[0], deterministic=not train)
                else:
                    y = mod(*ins)
                if spec.post_fn is not None:
                    y = spec.post_fn(y)
            else:
                y = spec.fn(*ins)
            acts[spec.name] = y
        out = acts[self.graph.output]
        if self.capture:
            return out, {n: acts[n] for n in self.capture}
        return out


# ---------------------------------------------------------------------------
# Keras-convention layer factories (shared by all zoo models)
# ---------------------------------------------------------------------------

def keras_default_init() -> Callable:
    """Keras's default kernel_initializer (glorot_uniform) — flax defaults
    to lecun_normal, which would give from-scratch training runs a
    different starting distribution than the reference. For depthwise
    kernels the fan_in+fan_out sum is layout-invariant (flax (kh,kw,1,C)
    vs Keras (kh,kw,C,1)), so glorot_uniform matches Keras exactly there
    too."""
    return nn.initializers.glorot_uniform()


def conv2d(name: str, inp: str, features: int, kernel: Tuple[int, int],
           strides: Tuple[int, int] = (1, 1), padding: str = "SAME",
           use_bias: bool = True, groups: int = 1,
           kernel_init: Optional[Callable] = None,
           dtype=None, act: Optional[Callable] = None) -> LayerSpec:
    def factory(name: str):
        return nn.Conv(features=features, kernel_size=kernel, strides=strides,
                       padding=padding, use_bias=use_bias,
                       feature_group_count=groups, dtype=dtype,
                       kernel_init=kernel_init or keras_default_init(),
                       name=name)
    return LayerSpec(name=name, kind=KIND_CONV, inputs=(inp,), module_fn=factory,
                     post_fn=act)


class DepthwiseConv(nn.Module):
    """Keras DepthwiseConv2D on the Pallas depthwise kernel.

    Parameter tree is IDENTICAL to ``nn.Conv(feature_group_count=C)`` —
    ``kernel [K, K, 1, C]`` (+ optional ``bias [C]``) under the layer name —
    so h5/ONNX import-export, parity tests, and checkpoints are unaffected.
    The forward runs ops/depthwise_pallas.depthwise_conv, which defaults to
    XLA's grouped conv everywhere: the hand-written Pallas shift-MAC kernel
    measured at 0.5-1.0x XLA on TPU v5e (depthwise is VPU-compute-bound and
    XLA's emitter is already near that roofline — docs/PERFORMANCE.md
    rejected-levers) and remains an ``ABLC_DEPTHWISE=pallas`` opt-in.
    Gradients always take the XLA path (custom_vjp), so training is
    bit-identical either way."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from ab_line_classifier_tpu.ops.depthwise_pallas import depthwise_conv

        c = x.shape[-1]
        if self.features != c:
            raise ValueError(
                f"DepthwiseConv features={self.features} must equal the "
                f"input channel count {c} (depth_multiplier 1, like Keras "
                f"DepthwiseConv2D)")
        kernel = self.param("kernel",
                            self.kernel_init or keras_default_init(),
                            tuple(self.kernel_size) + (1, c), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if self.strides[0] != self.strides[1]:
            raise ValueError("DepthwiseConv requires square strides")
        y = depthwise_conv(x, kernel, int(self.strides[0]),
                           self.padding)
        if bias is not None:
            y = y + bias
        return y


def depthwise_conv2d(name: str, inp: str, channels: int,
                     kernel: Tuple[int, int],
                     strides: Tuple[int, int] = (1, 1), padding: str = "SAME",
                     use_bias: bool = False,
                     kernel_init: Optional[Callable] = None,
                     dtype=None) -> LayerSpec:
    def factory(name: str):
        return DepthwiseConv(features=channels, kernel_size=kernel,
                             strides=strides, padding=padding,
                             use_bias=use_bias, dtype=dtype,
                             kernel_init=kernel_init or keras_default_init(),
                             name=name)
    return LayerSpec(name=name, kind=KIND_DEPTHWISE, inputs=(inp,), module_fn=factory)


class SeparableConv(nn.Module):
    """Keras SeparableConv2D: depthwise conv followed by a 1x1 pointwise conv,
    presented as a single layer (one graph node, params nested under the layer
    name as ``depthwise`` / ``pointwise``)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = DepthwiseConv(features=c, kernel_size=self.kernel_size,
                          strides=self.strides, padding=self.padding,
                          use_bias=False, dtype=self.dtype,
                          name="depthwise")(x)
        x = nn.Conv(features=self.features, kernel_size=(1, 1),
                    use_bias=self.use_bias,
                    kernel_init=keras_default_init(),
                    dtype=self.dtype, name="pointwise")(x)
        return x


def separable_conv2d(name: str, inp: str, features: int,
                     kernel: Tuple[int, int],
                     strides: Tuple[int, int] = (1, 1),
                     padding: str = "SAME", use_bias: bool = True,
                     dtype=None) -> LayerSpec:
    def factory(name: str):
        return SeparableConv(features=features, kernel_size=kernel,
                             strides=strides, padding=padding,
                             use_bias=use_bias, dtype=dtype, name=name)
    # kind=conv so Grad-CAM's last-conv scan matches SeparableConv2D layers,
    # as the reference's _keras_api_names 'Conv' scan does (gradcam.py:33-38).
    return LayerSpec(name=name, kind=KIND_CONV, inputs=(inp,), module_fn=factory)


class Normalization(nn.Module):
    """Keras ``layers.Normalization(axis=-1)``: ``(x - mean)/sqrt(variance)``
    with the statistics stored as non-trainable variables (keras keeps them
    as layer weights, loaded from h5 for pretrained models). Stored in the
    ``batch_stats`` collection so checkpoint/restore and h5 import treat them
    like BN statistics; nothing ever mutates them."""

    mean_init: Tuple[float, ...]
    variance_init: Tuple[float, ...]

    @nn.compact
    def __call__(self, x):
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.asarray(self.mean_init, jnp.float32))
        var = self.variable(
            "batch_stats", "variance",
            lambda: jnp.asarray(self.variance_init, jnp.float32))
        # Keras layers.Normalization floors the denominator at
        # backend.epsilon() (1e-7) so zero-variance channels (constant
        # input channel at adapt time, or pre-import zero stats) stay
        # finite instead of inf/NaN.
        denom = jnp.maximum(jnp.sqrt(var.value), 1e-7)
        return ((x - mean.value.astype(x.dtype))
                / denom.astype(x.dtype))


def normalization(name: str, inp: str, mean: Sequence[float],
                  variance: Sequence[float]) -> LayerSpec:
    def factory(name: str):
        return Normalization(mean_init=tuple(float(m) for m in mean),
                             variance_init=tuple(float(v) for v in variance),
                             name=name)
    return LayerSpec(name=name, kind=KIND_NORM, inputs=(inp,),
                     module_fn=factory)


def batch_norm(name: str, inp: str, momentum: float = 0.99,
               epsilon: float = 1e-3, scale: bool = True,
               dtype=None) -> LayerSpec:
    # Keras BatchNormalization defaults: momentum 0.99, epsilon 1e-3.
    def factory(name: str):
        return nn.BatchNorm(momentum=momentum, epsilon=epsilon, use_scale=scale,
                            dtype=dtype, name=name)
    return LayerSpec(name=name, kind=KIND_BN, inputs=(inp,), module_fn=factory)


def dense(name: str, inp: str, features: int, use_bias: bool = True,
          kernel_init: Optional[Callable] = None,
          bias_init: Optional[Callable] = None,
          dtype=None, act: Optional[Callable] = None) -> LayerSpec:
    def factory(name: str):
        kwargs = dict(features=features, use_bias=use_bias, dtype=dtype,
                      kernel_init=kernel_init or keras_default_init())
        if bias_init is not None:
            kwargs["bias_init"] = bias_init
        return nn.Dense(**kwargs, name=name)
    return LayerSpec(name=name, kind=KIND_DENSE, inputs=(inp,), module_fn=factory,
                     post_fn=act)


def dropout(name: str, inp: str, rate: float) -> LayerSpec:
    def factory(name: str):
        return nn.Dropout(rate=rate, name=name)
    return LayerSpec(name=name, kind=KIND_DROPOUT, inputs=(inp,), module_fn=factory)


def activation(name: str, inp: str, fn: Callable) -> LayerSpec:
    return LayerSpec(name=name, kind=KIND_FN, inputs=(inp,), fn=fn)


def relu(name: str, inp: str) -> LayerSpec:
    return activation(name, inp, lambda x: nn.relu(x))


def softmax(name: str, inp: str) -> LayerSpec:
    # float32 softmax output regardless of compute dtype (the reference pins
    # the output Activation to float32, models.py:92).
    return activation(name, inp, lambda x: nn.softmax(x.astype(jnp.float32), axis=-1))


def max_pool(name: str, inp: str, window: Tuple[int, int],
             strides: Optional[Tuple[int, int]] = None,
             padding: str = "VALID") -> LayerSpec:
    strides = strides or window
    return LayerSpec(
        name=name, kind=KIND_FN, inputs=(inp,),
        fn=lambda x: nn.max_pool(x, window_shape=window, strides=strides,
                                 padding=padding))


def avg_pool(name: str, inp: str, window: Tuple[int, int],
             strides: Optional[Tuple[int, int]] = None,
             padding: str = "VALID") -> LayerSpec:
    strides = strides or window
    return LayerSpec(
        name=name, kind=KIND_FN, inputs=(inp,),
        fn=lambda x: nn.avg_pool(x, window_shape=window, strides=strides,
                                 padding=padding))


def global_avg_pool(name: str, inp: str) -> LayerSpec:
    return LayerSpec(name=name, kind=KIND_FN, inputs=(inp,),
                     fn=lambda x: jnp.mean(x, axis=(1, 2)))


def zero_pad(name: str, inp: str, pad: Tuple[Tuple[int, int], Tuple[int, int]]) -> LayerSpec:
    return LayerSpec(
        name=name, kind=KIND_FN, inputs=(inp,),
        fn=lambda x: jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0))))


def add(name: str, a: str, b: str) -> LayerSpec:
    return LayerSpec(name=name, kind=KIND_FN, inputs=(a, b), fn=lambda x, y: x + y)


def multiply(name: str, a: str, b: str) -> LayerSpec:
    return LayerSpec(name=name, kind=KIND_FN, inputs=(a, b), fn=lambda x, y: x * y)


def input_node() -> LayerSpec:
    return LayerSpec(name=INPUT, kind=KIND_FN, inputs=(), fn=lambda: None)


def graph_of(*specs: LayerSpec, output: Optional[str] = None) -> LayerGraph:
    return LayerGraph(layers=(input_node(),) + tuple(specs),
                      output=output or specs[-1].name)
