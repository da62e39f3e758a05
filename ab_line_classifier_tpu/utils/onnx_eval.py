"""Minimal ONNX graph evaluator (numpy/lax), for validating exports.

No ONNX runtime exists in this environment, so exported models
(``models/onnx_export.py``) are validated by *executing the ONNX file* with
this interpreter — implemented from the ONNX operator spec (NCHW Conv/Pool,
explicit pads, numpy broadcasting), independent of the jaxpr that produced
the graph, so layout/attribute bugs in the exporter show up as numerical
mismatches in tests rather than silently round-tripping.

Supports the operator subset the exporter emits (opset 13 semantics).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ab_line_classifier_tpu.utils import onnx_proto as OP

_CAST = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
         10: np.float16, 11: np.float64}


def _conv(x, w, b, attrs):
    """ONNX Conv, NCHW, explicit pads [x1b, x2b, x1e, x2e]."""
    from jax import lax

    group = int(attrs.get("group", 1))
    strides = attrs.get("strides", [1] * (x.ndim - 2))
    dil = attrs.get("dilations", [1] * (x.ndim - 2))
    pads = attrs.get("pads", [0] * (2 * (x.ndim - 2)))
    n_sp = x.ndim - 2
    padding = [(int(pads[i]), int(pads[i + n_sp])) for i in range(n_sp)]
    out = lax.conv_general_dilated(
        x.astype(np.float32), w.astype(np.float32),
        window_strides=[int(s) for s in strides], padding=padding,
        rhs_dilation=[int(d) for d in dil],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group)
    out = np.asarray(out)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * n_sp)
    return out


def _pool(x, attrs, kind):
    from jax import lax

    k = [int(v) for v in attrs["kernel_shape"]]
    # ONNX spec: strides default to 1 along each spatial axis when the
    # attribute is omitted (NOT to the kernel shape).
    strides = [int(v) for v in attrs.get("strides", [1] * len(k))]
    pads = attrs.get("pads", [0] * (2 * len(k)))
    n_sp = len(k)
    padding = ([(0, 0), (0, 0)]
               + [(int(pads[i]), int(pads[i + n_sp])) for i in range(n_sp)])
    window = (1, 1) + tuple(k)
    stride = (1, 1) + tuple(strides)
    if kind == "max":
        init, op = -np.inf, lax.max
        out = lax.reduce_window(x.astype(np.float32), init, op, window,
                                stride, padding)
        return np.asarray(out)
    out = lax.reduce_window(x.astype(np.float32), 0.0, lax.add, window,
                            stride, padding)
    return np.asarray(out) / float(np.prod(k))


def evaluate(model, feeds: Dict[str, np.ndarray],
             outputs: List[str] = None) -> List[np.ndarray]:
    """Run the graph on the given input feeds; returns the outputs."""
    g = model.graph
    env: Dict[str, np.ndarray] = dict(OP.initializer_arrays(g))
    env.update({k: np.asarray(v) for k, v in feeds.items()})

    for node in g.node:
        attrs = OP.node_attrs(node)
        ins = [env[n] if n else None for n in node.input]
        op = node.op_type
        if op in ("Add", "Sub", "Mul", "Div", "Pow", "Max", "Min"):
            fn = {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
                  "Div": np.divide, "Pow": np.power, "Max": np.maximum,
                  "Min": np.minimum}[op]
            out = fn(ins[0], ins[1])
        elif op == "Neg":
            out = -ins[0]
        elif op == "Sqrt":
            out = np.sqrt(ins[0])
        elif op == "Reciprocal":
            out = 1.0 / ins[0]
        elif op == "Exp":
            out = np.exp(ins[0])
        elif op == "Log":
            out = np.log(ins[0])
        elif op == "Tanh":
            out = np.tanh(ins[0])
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-ins[0].astype(np.float64)))
            out = out.astype(np.float32)
        elif op == "Abs":
            out = np.abs(ins[0])
        elif op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
            out = np.clip(ins[0], lo, hi)
        elif op == "Where":
            out = np.where(ins[0], ins[1], ins[2])
        elif op == "Identity":
            out = ins[0]
        elif op == "IsInf":
            out = np.isinf(ins[0])
        elif op == "IsNaN":
            out = np.isnan(ins[0])
        elif op == "Or":
            out = np.logical_or(ins[0], ins[1])
        elif op == "And":
            out = np.logical_and(ins[0], ins[1])
        elif op == "Not":
            out = np.logical_not(ins[0])
        elif op == "Cast":
            out = ins[0].astype(_CAST[int(attrs["to"])])
        elif op == "Reshape":
            out = ins[0].reshape([int(s) for s in ins[1]])
        elif op == "Transpose":
            out = np.transpose(ins[0], attrs["perm"])
        elif op == "Expand":
            out = np.broadcast_to(ins[0], [int(s) for s in ins[1]]).copy()
        elif op == "Pad":
            pads = [int(p) for p in ins[1]]
            n = ins[0].ndim
            cval = (float(np.asarray(ins[2]).reshape(-1)[0])
                    if len(ins) > 2 and ins[2] is not None else 0.0)
            width = [(pads[i], pads[i + n]) for i in range(n)]
            out = np.pad(ins[0], width, constant_values=cval)
        elif op == "Concat":
            out = np.concatenate(ins, axis=int(attrs["axis"]))
        elif op == "MatMul":
            out = ins[0] @ ins[1]
        elif op == "Gemm":
            a = ins[0].T if int(attrs.get("transA", 0)) else ins[0]
            b = ins[1].T if int(attrs.get("transB", 0)) else ins[1]
            out = (float(attrs.get("alpha", 1.0)) * (a @ b))
            if len(ins) > 2 and ins[2] is not None:
                out = out + float(attrs.get("beta", 1.0)) * ins[2]
        elif op == "Einsum":
            out = np.einsum(attrs["equation"], *ins)
        elif op == "ReduceSum":
            axes = tuple(int(a) for a in ins[1]) if len(ins) > 1 else None
            out = np.sum(ins[0], axis=axes,
                         keepdims=bool(attrs.get("keepdims", 1)))
        elif op in ("ReduceMax", "ReduceMin", "ReduceProd", "ReduceMean"):
            fn = {"ReduceMax": np.max, "ReduceMin": np.min,
                  "ReduceProd": np.prod, "ReduceMean": np.mean}[op]
            axes = tuple(int(a) for a in attrs.get("axes", []))
            out = fn(ins[0], axis=axes or None,
                     keepdims=bool(attrs.get("keepdims", 1)))
        elif op == "Conv":
            out = _conv(ins[0], ins[1],
                        ins[2] if len(ins) > 2 else None, attrs)
        elif op == "MaxPool":
            out = _pool(ins[0], attrs, "max")
        elif op == "AveragePool":
            out = _pool(ins[0], attrs, "avg")
        elif op == "BatchNormalization":
            x, scale, bias, mean, var = ins[:5]
            eps = float(attrs.get("epsilon", 1e-5))
            shape = (1, -1) + (1,) * (x.ndim - 2)
            out = ((x - mean.reshape(shape))
                   / np.sqrt(var.reshape(shape) + eps)
                   * scale.reshape(shape) + bias.reshape(shape))
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Softmax":
            ax = int(attrs.get("axis", -1))  # opset-13 default
            z = ins[0] - ins[0].max(axis=ax, keepdims=True)
            e = np.exp(z)
            out = e / e.sum(axis=ax, keepdims=True)
        elif op == "GlobalAveragePool":
            out = ins[0].mean(axis=tuple(range(2, ins[0].ndim)),
                              keepdims=True)
        elif op == "Flatten":
            out = ins[0].reshape(ins[0].shape[0], -1)
        elif op == "Dropout":
            out = ins[0]
        else:
            raise NotImplementedError(f"evaluator has no op {node.op_type}")
        env[node.output[0]] = np.asarray(out)

    names = outputs or [o.name for o in g.output]
    return [env[n] for n in names]
