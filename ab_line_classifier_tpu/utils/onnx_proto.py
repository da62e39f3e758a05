"""Dependency-free ONNX protobuf IO.

The reference restores and serves ``.onnx`` checkpoints (reference
``src/predict.py:39-51``: ``prepare(onnx.load(model_path))``). This
environment has no ``onnx`` package or runtime, so restore here is a
*weight importer*: the initializers (and the node topology that gives each
initializer its semantic role) are read straight from the protobuf with a
checked-in subset of the official schema (``onnx_minimal.proto``,
field-number-exact, so real exporter files parse — unknown fields are
skipped by the protobuf runtime).

This module holds the low-level pieces: load/save ModelProto and
numpy <-> TensorProto conversion. The layer mapping lives in
``models/onnx_weights.py``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ab_line_classifier_tpu.utils import onnx_minimal_pb2 as P

# TensorProto.DataType -> numpy dtype (subset that appears as weights).
_DTYPES = {
    P.TensorProto.FLOAT: np.float32,
    P.TensorProto.UINT8: np.uint8,
    P.TensorProto.INT8: np.int8,
    P.TensorProto.UINT16: np.uint16,
    P.TensorProto.INT16: np.int16,
    P.TensorProto.INT32: np.int32,
    P.TensorProto.INT64: np.int64,
    P.TensorProto.BOOL: np.bool_,
    P.TensorProto.FLOAT16: np.float16,
    P.TensorProto.DOUBLE: np.float64,
    P.TensorProto.UINT32: np.uint32,
    P.TensorProto.UINT64: np.uint64,
}


def load_model(path: str) -> "P.ModelProto":
    """Parse a .onnx file into the minimal ModelProto."""
    model = P.ModelProto()
    with open(path, "rb") as f:
        model.ParseFromString(f.read())
    return model


def save_model(model: "P.ModelProto", path: str) -> None:
    with open(path, "wb") as f:
        f.write(model.SerializeToString())


def tensor_to_array(t: "P.TensorProto") -> np.ndarray:
    """TensorProto -> numpy array (raw_data or the typed repeated fields)."""
    dims = tuple(t.dims)
    if t.data_type == P.TensorProto.BFLOAT16:
        # no numpy bfloat16: widen via uint16 bit pattern -> float32
        if t.raw_data:
            bits = np.frombuffer(t.raw_data, np.uint16)
        else:
            bits = np.asarray(t.int32_data, np.uint16)
        return (bits.astype(np.uint32) << 16).view(np.float32).reshape(dims)
    dtype = _DTYPES.get(t.data_type)
    if dtype is None:
        raise ValueError(f"unsupported tensor data_type {t.data_type} "
                         f"for initializer {t.name!r}")
    if t.raw_data:
        return np.frombuffer(t.raw_data, dtype).reshape(dims).copy()
    if t.data_type == P.TensorProto.FLOAT:
        data = np.asarray(t.float_data, np.float32)
    elif t.data_type == P.TensorProto.DOUBLE:
        data = np.asarray(t.double_data, np.float64)
    elif t.data_type == P.TensorProto.INT64:
        data = np.asarray(t.int64_data, np.int64)
    elif t.data_type in (P.TensorProto.UINT32, P.TensorProto.UINT64):
        data = np.asarray(t.uint64_data, np.uint64).astype(dtype)
    else:  # int32_data holds int32/16/8, uint16/8, bool, float16 (as bits)
        if t.data_type == P.TensorProto.FLOAT16:
            data = np.asarray(t.int32_data, np.uint16).view(np.float16)
        else:
            data = np.asarray(t.int32_data, np.int32).astype(dtype)
    return data.reshape(dims)


def array_to_tensor(a: np.ndarray, name: str) -> "P.TensorProto":
    """numpy array -> TensorProto (raw_data encoding)."""
    a = np.ascontiguousarray(a)
    rev = {v: k for k, v in _DTYPES.items()}
    dt = rev.get(a.dtype.type)
    if dt is None:
        a = a.astype(np.float32)
        dt = P.TensorProto.FLOAT
    t = P.TensorProto(name=name, data_type=dt)
    t.dims.extend(a.shape)
    t.raw_data = a.tobytes()
    return t


def initializer_arrays(graph: "P.GraphProto") -> Dict[str, np.ndarray]:
    """All graph initializers as {name: ndarray}."""
    return {t.name: tensor_to_array(t) for t in graph.initializer}


def node_attrs(node: "P.NodeProto") -> Dict[str, object]:
    """Node attributes as a plain dict (scalar int/float/string + ints)."""
    out: Dict[str, object] = {}
    for a in node.attribute:
        if a.type == P.AttributeProto.INT:
            out[a.name] = int(a.i)
        elif a.type == P.AttributeProto.FLOAT:
            out[a.name] = float(a.f)
        elif a.type == P.AttributeProto.STRING:
            out[a.name] = a.s.decode("utf-8", "replace")
        elif a.type == P.AttributeProto.INTS:
            out[a.name] = [int(v) for v in a.ints]
        elif a.type == P.AttributeProto.FLOATS:
            out[a.name] = [float(v) for v in a.floats]
    return out
