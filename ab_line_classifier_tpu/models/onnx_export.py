"""ONNX model export: jaxpr -> ONNX graph, runtime-free.

The reference *serves* ``.onnx`` checkpoints on the WaveBase device
(reference ``src/predict.py:39-51``, ``src/deploy.py:36-68``) but the files
themselves come from an external keras->tf2onnx conversion. This exporter
closes the outbound half of that workflow: any zoo model trained here
exports to a standard ONNX file (opset 13) that onnxruntime / onnx-tf can
serve — so a reference user's device-deployment path keeps working.

Mechanism: trace the model's inference ``apply`` to a jaxpr and convert
primitive-by-primitive. This covers every architecture in the zoo without
per-model export code:

* ``conv_general_dilated`` -> ``Conv`` (NHWC<->NCHW transposes emitted at
  the node boundary; HWIO kernels folded to OIHW in the initializer).
* ``dot_general`` -> ``MatMul`` when it is a plain 2-D contraction (the
  Dense layers), ``Einsum`` otherwise.
* ``reduce_window_max`` -> ``MaxPool``; sum-window -> ``AveragePool`` x N.
* elementwise / reduce / shape primitives -> their ONNX counterparts.
* ``pjit`` / ``custom_jvp_call`` etc. are inlined (silu, softmax, ...).

Initializer names follow the tf2onnx convention (``model/<layer>/<leaf>:0``)
so :mod:`models.onnx_weights` imports exported files back by layer name —
the export/import pair round-trips (tested in ``tests/test_onnx_export.py``,
which also checks numerical parity through an independent ONNX evaluator).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.utils import onnx_minimal_pb2 as P
from ab_line_classifier_tpu.utils import onnx_proto as OP

_INLINE_PRIMS = {"pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
                 "custom_vjp_call", "custom_jvp_call_jaxpr", "remat",
                 "checkpoint", "custom_vjp_call_jaxpr"}

_ELEMENTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow", "neg": "Neg",
    "exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
    "sqrt": "Sqrt", "sign": "Sign", "abs": "Abs", "floor": "Floor",
    "ceil": "Ceil",
}

_REDUCE = {"reduce_sum": "ReduceSum", "reduce_max": "ReduceMax",
           "reduce_min": "ReduceMin", "reduce_prod": "ReduceProd"}


class ExportError(NotImplementedError):
    pass


class _Exporter:
    def __init__(self):
        self.model = P.ModelProto(ir_version=8, producer_name="ablc-tpu")
        op = self.model.opset_import.add()
        op.version = 13
        self.g = self.model.graph
        self.g.name = "model"
        self._uid = itertools.count()
        self._names: Dict[Any, str] = {}     # jaxpr Var -> value name
        self._init_names = set()
        # vars whose Expand was deferred (ONNX elementwise ops broadcast
        # numpy-style, so most jaxpr broadcast_in_dims need no node):
        # var -> full output shape, materialized only for non-broadcasting
        # consumers via name_full(). _actual_shape holds the shape the
        # emitted ONNX tensor really has (the pre-Expand "mid" shape) so
        # elementwise consumers can tell whether broadcasting against their
        # other operands reaches the full jaxpr shape or the deferral must
        # propagate to their own output.
        self._deferred_expand: Dict[Any, Tuple[int, ...]] = {}
        self._actual_shape: Dict[Any, Tuple[int, ...]] = {}

    # -- plumbing ----------------------------------------------------------
    def fresh(self, hint: str = "v") -> str:
        return f"{hint}_{next(self._uid)}"

    def add_init(self, arr: np.ndarray, name: Optional[str] = None) -> str:
        name = name or self.fresh("const")
        self.g.initializer.append(OP.array_to_tensor(np.asarray(arr), name))
        self._init_names.add(name)
        return name

    def name_of(self, atom) -> str:
        from jax._src.core import Literal

        if isinstance(atom, Literal):
            val = np.asarray(atom.val)
            if val.dtype == np.float64:
                val = val.astype(np.float32)
            return self.add_init(val)
        return self._names[atom]

    def bind(self, var, name: str) -> None:
        self._names[var] = name

    def name_full(self, atom) -> str:
        """Like name_of, but materializes a deferred Expand — for consumers
        that do NOT broadcast (Reshape/Transpose/Conv/MatMul/Reduce/...)."""
        from jax._src.core import Literal

        name = self.name_of(atom)
        shape = (None if isinstance(atom, Literal)
                 else self._deferred_expand.get(atom))
        if shape is not None:
            tgt = self.add_init(np.asarray(shape, np.int64))
            name = self.node("Expand", [name, tgt])[0]
            self.bind(atom, name)
            del self._deferred_expand[atom]
            self._actual_shape.pop(atom, None)
        return name

    def _eff_shape(self, atom) -> Tuple[int, ...]:
        """Shape of the ONNX tensor actually bound to ``atom`` (the mid
        shape when its Expand is deferred, the jaxpr shape otherwise)."""
        from jax._src.core import Literal

        if isinstance(atom, Literal):
            return tuple(np.shape(atom.val))
        if atom in self._deferred_expand:
            return self._actual_shape[atom]
        return tuple(int(s) for s in atom.aval.shape)

    def _copy_deferral(self, src_atom, dst_var) -> None:
        """Propagate deferred-Expand state across an inlined call boundary
        (pjit/custom_jvp_call): the inner invar (resp. outer outvar) is
        bound to the same mid-shape tensor as the outer atom, so it must
        carry the same pending Expand or a non-broadcasting consumer on
        the other side of the boundary would read an under-sized tensor."""
        from jax._src.core import Literal

        if isinstance(src_atom, Literal):
            return
        shape = self._deferred_expand.get(src_atom)
        if shape is not None:
            self._deferred_expand[dst_var] = shape
            self._actual_shape[dst_var] = self._actual_shape[src_atom]

    def _bind_broadcasting(self, eqn, out_name: str, in_atoms) -> None:
        """Bind a broadcasting (elementwise/Where/...) op's output. The
        emitted tensor's shape is the numpy broadcast of the operands'
        ACTUAL shapes — smaller than the jaxpr output shape when every
        operand was itself a deferred broadcast — so the deferral must
        propagate to this output or a later non-broadcasting consumer
        (Reshape/Reduce/...) would silently read an under-sized tensor."""
        out_var = eqn.outvars[0]
        self.bind(out_var, out_name)
        actual = tuple(int(s) for s in np.broadcast_shapes(
            *[self._eff_shape(a) for a in in_atoms]))
        want = tuple(int(s) for s in out_var.aval.shape)
        if actual != want:
            self._deferred_expand[out_var] = want
            self._actual_shape[out_var] = actual

    def node(self, op_type: str, inputs: Sequence[str], n_out: int = 1,
             name: Optional[str] = None, **attrs) -> List[str]:
        n = self.g.node.add()
        n.op_type = op_type
        n.name = name or self.fresh(op_type)
        n.input.extend(inputs)
        outs = [self.fresh(op_type.lower()) for _ in range(n_out)]
        n.output.extend(outs)
        for k, v in attrs.items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, int):
                a.i = v
                a.type = P.AttributeProto.INT
            elif isinstance(v, float):
                a.f = v
                a.type = P.AttributeProto.FLOAT
            elif isinstance(v, str):
                a.s = v.encode()
                a.type = P.AttributeProto.STRING
            elif isinstance(v, (list, tuple)) and all(
                    isinstance(x, int) for x in v):
                a.ints.extend(v)
                a.type = P.AttributeProto.INTS
            else:
                raise ExportError(f"attr {k}={v!r}")
        return outs

    def is_initializer(self, name: str) -> bool:
        return name in self._init_names

    def get_init(self, name: str) -> np.ndarray:
        for t in self.g.initializer:
            if t.name == name:
                return OP.tensor_to_array(t)
        raise KeyError(name)

    def replace_init(self, name: str, arr: np.ndarray) -> None:
        for i, t in enumerate(self.g.initializer):
            if t.name == name:
                new = OP.array_to_tensor(np.asarray(arr), name)
                self.g.initializer[i].CopyFrom(new)
                return
        raise KeyError(name)

    # -- primitive handlers --------------------------------------------
    def convert(self, jaxpr, consts) -> None:
        for var, const in zip(jaxpr.constvars, consts):
            self.bind(var, self.add_init(np.asarray(const)))
        self._convert_eqns(jaxpr)

    def _convert_eqns(self, jaxpr) -> None:
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            if prim in _INLINE_PRIMS:
                inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                if hasattr(inner, "jaxpr"):  # ClosedJaxpr
                    consts = inner.consts
                    inner = inner.jaxpr
                else:
                    consts = ()
                if prim == "custom_jvp_call" and inner is None:
                    inner = eqn.params["call_jaxpr"].jaxpr
                    consts = eqn.params["call_jaxpr"].consts
                for var, const in zip(inner.constvars, consts):
                    self.bind(var, self.add_init(np.asarray(const)))
                # custom_jvp_call passes extra tangent args sometimes; align
                # from the front (invars == jaxpr invars for these prims).
                for ivar, atom in zip(inner.invars, eqn.invars):
                    self.bind(ivar, self.name_of(atom))
                    self._copy_deferral(atom, ivar)
                self._convert_eqns(inner)
                for ovar, inner_out in zip(eqn.outvars, inner.outvars):
                    self.bind(ovar, self.name_of(inner_out))
                    self._copy_deferral(inner_out, ovar)
                continue
            handler = getattr(self, f"_p_{prim}", None)
            if handler is None:
                handler = self._generic
            handler(eqn)

    def _generic(self, eqn):
        prim = eqn.primitive.name
        if prim in _ELEMENTWISE:
            ins = [self.name_of(a) for a in eqn.invars]
            out = self.node(_ELEMENTWISE[prim], ins)[0]
            self._bind_broadcasting(eqn, out, eqn.invars)
            return
        if prim in _REDUCE:
            self._reduce(eqn, _REDUCE[prim])
            return
        raise ExportError(
            f"no ONNX mapping for primitive {prim!r} "
            f"(shapes {[getattr(v.aval, 'shape', '?') for v in eqn.invars]})")

    # elementwise with special lowering ---------------------------------
    def _p_rsqrt(self, eqn):
        s = self.node("Sqrt", [self.name_of(eqn.invars[0])])[0]
        out = self.node("Reciprocal", [s])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_is_finite(self, eqn):
        # isfinite = not (isinf or isnan); ONNX has no IsFinite op.
        x = self.name_of(eqn.invars[0])
        inf = self.node("IsInf", [x])[0]
        nan = self.node("IsNaN", [x])[0]
        bad = self.node("Or", [inf, nan])[0]
        out = self.node("Not", [bad])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_integer_pow(self, eqn):
        x = self.name_of(eqn.invars[0])
        y = int(eqn.params["y"])
        if y == 2:
            out = self.node("Mul", [x, x])[0]
        else:
            p = self.add_init(np.float32(y))
            out = self.node("Pow", [x, p])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_clamp(self, eqn):
        lo, x, hi = [self.name_of(a) for a in eqn.invars]
        out = self.node("Clip", [x, lo, hi])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_select_n(self, eqn):
        # select_n(pred, on_false, on_true) -> Where(pred, on_true, on_false)
        if len(eqn.invars) != 3:
            raise ExportError("select_n with >2 cases")
        pred, f, t = [self.name_of(a) for a in eqn.invars]
        out = self.node("Where", [pred, t, f])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_stop_gradient(self, eqn):
        out = self.node("Identity", [self.name_of(eqn.invars[0])])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_copy(self, eqn):
        out = self.node("Identity", [self.name_of(eqn.invars[0])])[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    def _p_convert_element_type(self, eqn):
        dt = np.dtype(eqn.params["new_dtype"])
        # f64 AND bf16 demote to f32: the export contract is an f32
        # graph (weights enter pre-cast to f32), so a mixed-precision
        # checkpoint's bf16 compute casts become f32 identities rather
        # than failing the whole export (opset-13 consumers commonly
        # lack bfloat16 kernels anyway).
        demoted = dt in (np.dtype(np.float64), np.dtype(jnp.bfloat16))
        onnx_dt = 1 if demoted else {
            np.dtype(np.float32): 1, np.dtype(np.float16): 10,
            np.dtype(np.int32): 6, np.dtype(np.int64): 7,
            np.dtype(np.bool_): 9}.get(dt)
        if onnx_dt is None:
            raise ExportError(f"cast to {dt}")
        src = self.name_of(eqn.invars[0])
        # fold casts of initializers (bf16 params pre-cast to f32 on entry)
        if self.is_initializer(src):
            arr = self.get_init(src).astype(np.float32 if demoted else dt)
            self._bind_broadcasting(eqn, self.add_init(arr), eqn.invars)
            return
        out = self.node("Cast", [src], to=onnx_dt)[0]
        self._bind_broadcasting(eqn, out, eqn.invars)

    # shape ops ----------------------------------------------------------
    def _p_reshape(self, eqn):
        shape = self.add_init(np.asarray(eqn.params["new_sizes"], np.int64))
        out = self.node("Reshape", [self.name_full(eqn.invars[0]), shape])[0]
        self.bind(eqn.outvars[0], out)

    def _p_squeeze(self, eqn):
        shape = self.add_init(np.asarray(eqn.outvars[0].aval.shape, np.int64))
        out = self.node("Reshape", [self.name_full(eqn.invars[0]), shape])[0]
        self.bind(eqn.outvars[0], out)

    def _p_transpose(self, eqn):
        out = self.node("Transpose", [self.name_full(eqn.invars[0])],
                        perm=[int(p) for p in eqn.params["permutation"]])[0]
        self.bind(eqn.outvars[0], out)

    def _p_broadcast_in_dim(self, eqn):
        in_aval = eqn.invars[0].aval
        out_shape = tuple(int(s) for s in eqn.params["shape"])
        bdims = tuple(int(d) for d in eqn.params["broadcast_dimensions"])
        # name_full: a broadcast-of-a-deferred-broadcast must materialize
        # the inner Expand first, or the Reshape below would see the mid
        # shape instead of in_aval's.
        src = self.name_full(eqn.invars[0])

        # Reshape to insert singleton dims at the broadcast positions, then
        # Expand only if sizes actually grow on a non-right-aligned pattern.
        mid_shape = [1] * len(out_shape)
        for i, d in enumerate(bdims):
            mid_shape[d] = int(in_aval.shape[i])
        if tuple(mid_shape) != tuple(in_aval.shape) or not in_aval.shape:
            if self.is_initializer(src):
                src = self.add_init(
                    self.get_init(src).reshape(mid_shape))
            else:
                shape = self.add_init(np.asarray(mid_shape, np.int64))
                src = self.node("Reshape", [src, shape])[0]
        # numpy-style broadcasting in the consumer covers the rest: ONNX
        # elementwise ops broadcast right-aligned and mid_shape is already
        # rank-aligned, so the Expand is DEFERRED — name_full() materializes
        # it only if a non-broadcasting consumer needs the full shape. This
        # keeps Dense/Conv bias adds as `Add(y, bias-initializer)`, the
        # pattern onnx importers (incl. ours) recognize.
        self.bind(eqn.outvars[0], src)
        if tuple(mid_shape) != out_shape:
            self._deferred_expand[eqn.outvars[0]] = out_shape
            self._actual_shape[eqn.outvars[0]] = tuple(mid_shape)

    def _p_pad(self, eqn):
        cfg = eqn.params["padding_config"]
        if any(int(i) for _, _, i in cfg):
            raise ExportError("interior padding")
        lo = [int(l) for l, _, _ in cfg]
        hi = [int(h) for _, h, _ in cfg]
        if any(v < 0 for v in lo + hi):
            raise ExportError("negative padding")
        pads = self.add_init(np.asarray(lo + hi, np.int64))
        x = self.name_full(eqn.invars[0])
        cval = self.name_of(eqn.invars[1])
        out = self.node("Pad", [x, pads, cval], mode="constant")[0]
        self.bind(eqn.outvars[0], out)

    def _p_concatenate(self, eqn):
        ins = [self.name_full(a) for a in eqn.invars]
        out = self.node("Concat", ins, axis=int(eqn.params["dimension"]))[0]
        self.bind(eqn.outvars[0], out)

    # reductions ----------------------------------------------------------
    def _reduce(self, eqn, op_type: str):
        axes = self.add_init(np.asarray(eqn.params["axes"], np.int64))
        x = self.name_full(eqn.invars[0])
        if op_type == "ReduceSum":  # opset 13: axes as input
            out = self.node(op_type, [x, axes], keepdims=0)[0]
        else:  # ReduceMax/Min/Prod keep axes as attribute at opset 13
            out = self.node(op_type, [x],
                            axes=[int(a) for a in eqn.params["axes"]],
                            keepdims=0)[0]
        self.bind(eqn.outvars[0], out)

    # matmul / conv / pool -------------------------------------------------
    def _p_dot_general(self, eqn):
        ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
        lhs, rhs = eqn.invars
        ln, rn = self.name_full(lhs), self.name_full(rhs)
        l_rank = len(lhs.aval.shape)
        r_rank = len(rhs.aval.shape)
        if (not lb and not rb and l_rank == 2 and r_rank == 2
                and tuple(lc) == (1,) and tuple(rc) == (0,)):
            out = self.node("MatMul", [ln, rn])[0]
            self.bind(eqn.outvars[0], out)
            return
        # general case: Einsum with an explicit equation
        letters = "abcdefghijklmnopqrstuvwxyz"
        it = iter(letters)
        l_sub = [next(it) for _ in range(l_rank)]
        r_sub = [""] * r_rank
        for li, ri in zip(lb, rb):
            r_sub[ri] = l_sub[li]
        for li, ri in zip(lc, rc):
            r_sub[ri] = l_sub[li]
        for i in range(r_rank):
            if not r_sub[i]:
                r_sub[i] = next(it)
        out_sub = ([l_sub[i] for i in lb]
                   + [l_sub[i] for i in range(l_rank)
                      if i not in lb and i not in lc]
                   + [r_sub[i] for i in range(r_rank)
                      if i not in rb and i not in rc])
        eq = f"{''.join(l_sub)},{''.join(r_sub)}->{''.join(out_sub)}"
        out = self.node("Einsum", [ln, rn], equation=eq)[0]
        self.bind(eqn.outvars[0], out)

    def _p_conv_general_dilated(self, eqn):
        dn = eqn.params["dimension_numbers"]
        lhs_spec = dn.lhs_spec   # e.g. (0, 3, 1, 2) means NHWC input? jax
        # stores specs as (batch, feature, *spatial) index positions.
        rhs_spec = dn.rhs_spec
        out_spec = dn.out_spec
        strides = [int(s) for s in eqn.params["window_strides"]]
        padding = eqn.params["padding"]
        lhs_dil = eqn.params.get("lhs_dilation")
        rhs_dil = eqn.params.get("rhs_dilation")
        groups = int(eqn.params.get("feature_group_count", 1))
        if lhs_dil and any(int(d) != 1 for d in lhs_dil):
            raise ExportError("transposed/dilated-input conv")

        x = self.name_full(eqn.invars[0])
        w = self.name_full(eqn.invars[1])

        # Input to NCHW: lhs_spec gives (N_pos, C_pos, H_pos, W_pos).
        n_sp = len(strides)
        perm_in = [lhs_spec[0], lhs_spec[1]] + list(lhs_spec[2:])
        if perm_in != list(range(n_sp + 2)):
            x = self.node("Transpose", [x], perm=perm_in)[0]

        # Kernel to OIHW: rhs_spec = (O_pos, I_pos, *spatial_pos).
        perm_w = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
        if perm_w != list(range(n_sp + 2)):
            if self.is_initializer(w):
                self.replace_init(w, np.transpose(self.get_init(w), perm_w))
            else:
                w = self.node("Transpose", [w], perm=perm_w)[0]

        pads = ([int(lo) for lo, _ in padding]
                + [int(hi) for _, hi in padding])
        kw = dict(strides=strides, pads=pads, group=groups)
        if rhs_dil and any(int(d) != 1 for d in rhs_dil):
            kw["dilations"] = [int(d) for d in rhs_dil]
        out = self.node("Conv", [x, w], **kw)[0]

        # Back to the jaxpr's output layout.
        # out_spec positions: out dims order such that dim out_spec[0]=N etc.
        inv = [0] * (n_sp + 2)
        for onnx_dim, jax_pos in enumerate([out_spec[0], out_spec[1],
                                            *out_spec[2:]]):
            inv[jax_pos] = onnx_dim
        if inv != list(range(n_sp + 2)):
            out = self.node("Transpose", [out], perm=inv)[0]
        self.bind(eqn.outvars[0], out)

    def _window_attrs(self, eqn):
        dims = [int(d) for d in eqn.params["window_dimensions"]]
        strides = [int(s) for s in eqn.params["window_strides"]]
        padding = eqn.params["padding"]
        if dims[0] != 1 or dims[-1] != 1:
            raise ExportError("pooling over batch/channel dims")
        pads = ([int(lo) for lo, _ in padding[1:-1]]
                + [int(hi) for _, hi in padding[1:-1]])
        return dims[1:-1], strides[1:-1], pads

    def _pool(self, eqn, op_type: str):
        kernel, strides, pads = self._window_attrs(eqn)
        x = self.name_full(eqn.invars[0])
        rank = len(eqn.invars[0].aval.shape)
        perm = [0, rank - 1] + list(range(1, rank - 1))     # NHWC -> NCHW
        inv = [0] + list(range(2, rank)) + [1]              # NCHW -> NHWC
        x = self.node("Transpose", [x], perm=perm)[0]
        kw = dict(kernel_shape=kernel, strides=strides, pads=pads)
        if op_type == "AveragePool":
            kw["count_include_pad"] = 1
        out = self.node(op_type, [x], **kw)[0]
        out = self.node("Transpose", [out], perm=inv)[0]
        return out

    def _p_reduce_window_max(self, eqn):
        self.bind(eqn.outvars[0], self._pool(eqn, "MaxPool"))

    def _p_reduce_window_sum(self, eqn):
        kernel, _, _ = self._window_attrs(eqn)
        out = self._pool(eqn, "AveragePool")
        scale = self.add_init(np.float32(float(np.prod(kernel))))
        out = self.node("Mul", [out, scale])[0]
        self.bind(eqn.outvars[0], out)


def _leaf_name(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        if key is None:
            key = str(p)
        parts.append(str(key))
    # drop the collection prefix (params / batch_stats): keras-style names
    if parts and parts[0] in ("params", "batch_stats"):
        parts = parts[1:]
    return "model/" + "/".join(parts) + ":0"


def export_onnx(spec, variables: Dict[str, Any], path: str, *,
                batch_size: int = 1) -> "P.ModelProto":
    """Export ``spec``'s inference forward (softmax output) to an ONNX file.

    The exported model consumes preprocessed float32 input
    ``[batch, H, W, 3]`` — the same contract as the reference's ONNX
    checkpoints (its ONNX predict path preprocesses on host first,
    reference predict.py:67-73). Returns the ModelProto (also written to
    ``path``)."""
    module = spec.module()
    f32_vars = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        variables)
    x_spec = jax.ShapeDtypeStruct(
        (batch_size,) + tuple(spec.input_shape), jnp.float32)

    def fwd(v, x):
        return module.apply(v, x, train=False).astype(jnp.float32)

    closed = jax.make_jaxpr(fwd)(f32_vars, x_spec)

    ex = _Exporter()
    # bind parameter leaves to named initializers, the input to a graph input
    leaves = jax.tree_util.tree_flatten_with_path((f32_vars, x_spec))[0]
    jaxpr = closed.jaxpr
    assert len(leaves) == len(jaxpr.invars)
    input_name = "input_1"
    for (p, leaf), var in zip(leaves, jaxpr.invars):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            ex.bind(var, input_name)
        else:
            ex.bind(var, ex.add_init(np.asarray(leaf), _leaf_name(p[1:])))
    ex.convert(jaxpr, closed.consts)

    gin = ex.g.input.add()
    gin.name = input_name
    gin.type.tensor_type.elem_type = P.TensorProto.FLOAT
    for d in x_spec.shape:
        gin.type.tensor_type.shape.dim.add().dim_value = int(d)
    gout = ex.g.output.add()
    gout.name = ex.name_full(jaxpr.outvars[0])
    gout.type.tensor_type.elem_type = P.TensorProto.FLOAT
    for d in jaxpr.outvars[0].aval.shape:
        gout.type.tensor_type.shape.dim.add().dim_value = int(d)

    OP.save_model(ex.model, path)
    return ex.model
