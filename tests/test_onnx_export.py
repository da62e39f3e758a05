"""ONNX export: numerical parity via an independent evaluator + round-trip.

The exported graph is executed by ``utils/onnx_eval.py`` — an interpreter
written from the ONNX operator spec (NCHW Conv/Pool, numpy broadcasting),
independent of the jaxpr that produced the graph — and compared against the
model's own forward. Outbound half of the reference's ONNX deployment
workflow (reference predict.py:39-51, deploy.py:36-68)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.models.onnx_export import export_onnx
from ab_line_classifier_tpu.models.onnx_weights import import_onnx_weights
from ab_line_classifier_tpu.utils import onnx_proto as OP
from ab_line_classifier_tpu.utils.onnx_eval import evaluate

pytestmark = pytest.mark.slow


HP = {
    "cutoffvgg16": {"LR_EXTRACT": 3e-4, "LR_FINETUNE": 9.3e-6,
                    "DROPOUT": 0.45, "CUTOFF_LAYER": 10,
                    "FINETUNE_LAYER": 7, "EXTRACT_EPOCHS": 6},
    "cnn0": {"LR": 1e-3, "DROPOUT": 0.35, "L2_LAMBDA": 1e-4,
             "NODES_DENSE0": 16, "KERNEL_SIZE": 3, "STRIDES": 1,
             "MAXPOOL_SIZE": 2, "BLOCKS": 2, "INIT_FILTERS": 4,
             "FILTER_EXP_BASE": 2},
    "custom_resnetv2": {"LR": 4.6e-5, "DROPOUT0": 0.45, "DROPOUT1": 0.4,
                        "STRIDES": 1, "BLOCKS": 1, "INIT_FILTERS": 8},
    "mobilenetv2": {"LR": 1e-4, "DROPOUT": 0.35, "L2_LAMBDA": 1e-3,
                    "NODES_DENSE0": 32, "FREEZE_IDX": 116,
                    "CUTOFF_IDX": 115},
    "xception": {"LR": 1e-4, "DROPOUT": 0.4, "FREEZE_IDX": 50,
                 "NODES_DENSE0": 16},
    "vgg16": {"LR": 0.01, "DROPOUT": 0.5, "L2_LAMBDA": 0.01,
              "NODES_DENSE0": 8, "FREEZE_IDX": -1},
    # b7 is not in ZOO (its ONNX round trip is the dedicated full-size
    # test below) but other whole-zoo suites (test_gradcam_zoo) use it.
    "efficientnetb7": {"LR": 0.1, "DROPOUT": 0.5, "L2_LAMBDA": 0.01,
                       "FREEZE_IDX": -1},
}
IMG = (64, 64, 3)

# every layer family: plain convs+dense (cutoffvgg16, vgg16 incl. the full
# backbone + 2 dense layers), BN+fused-relu convs (cnn0), depthwise+relu6+
# residual adds (mobilenetv2), separable convs + maxpool residuals
# (xception), pre-activation bottlenecks (custom_resnetv2); the
# EfficientNet family (silu, squeeze-excite) round-trips via the b0 test
# AND the full production b7 (test_export_efficientnetb7_roundtrip).
ZOO = ["cutoffvgg16", "cnn0", "mobilenetv2", "xception", "custom_resnetv2",
       "vgg16"]


def _randomize(variables, seed: int):
    """Fill every leaf with non-zero uniform values. Fresh inits carry
    ZERO biases, which once hid an importer bug (unbound biases silently
    kept their zero init and every round-trip assertion still passed) —
    round-trip tests must run on a tree where no leaf is at its init
    value. Uniform-positive keeps BN variances valid."""
    rs = np.random.RandomState(seed)
    return jax.tree.map(
        lambda a: jnp.asarray(rs.uniform(0.05, 1.0, np.shape(a)),
                              dtype=a.dtype), variables)


@pytest.mark.parametrize("name", ZOO)
def test_export_matches_forward(name, tmp_path):
    spec = build_model(name, HP[name], IMG, 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    path = str(tmp_path / f"{name}.onnx")
    model = export_onnx(spec, v, path, batch_size=2)
    assert os.path.getsize(path) > 0
    # structure sanity: Conv nodes in NCHW with OIHW initializer kernels
    convs = [n for n in model.graph.node if n.op_type == "Conv"]
    assert convs
    inits = OP.initializer_arrays(model.graph)
    k = inits[[i for i in convs[0].input if i in inits][0]]
    assert k.ndim == 4 and k.shape[2] == k.shape[3]  # OIHW: kH == kW

    x = np.random.RandomState(0).randn(2, *IMG).astype(np.float32)
    ref = np.asarray(spec.module().apply(v, jnp.asarray(x), train=False))
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, ref, atol=5e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_export_efficientnetb7_roundtrip(tmp_path):
    """The full production efficientnetb7 (64M params, 55 blocks) exports
    and matches the jitted forward through the independent evaluator —
    B7's compound-scaled graph itself, not the B0 proxy (reference
    models.py:198-245)."""
    spec = build_model("efficientnetb7", HP["efficientnetb7"], IMG, 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    path = str(tmp_path / "effb7.onnx")
    export_onnx(spec, v, path, batch_size=2)
    assert os.path.getsize(path) > 100 * 1024 * 1024  # 64M f32 params
    x = np.random.RandomState(0).randn(2, *IMG).astype(np.float32)
    ref = np.asarray(spec.module().apply(v, jnp.asarray(x), train=False))
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_export_efficientnet_family(tmp_path):
    """EfficientNet layer family (silu via custom_jvp, squeeze-excite
    global-pool multiplies, stem rescaling) exports and matches — exercised
    on the b0 backbone at unit cost (the full b7 round-trips in
    test_export_efficientnetb7_roundtrip)."""
    from ab_line_classifier_tpu.models import common as C
    from ab_line_classifier_tpu.models.efficientnet import (
        efficientnet_backbone)

    backbone = efficientnet_backbone("b0", input_size=IMG[:2])
    graph, regs = C.classifier_head(backbone, n_classes=2, dropout=0.5)
    spec = C.ModelSpec(name="efficientnetb0", graph=graph,
                       preprocess_mode="identity",
                       phases=C.single_phase(graph, -1, 0.1),
                       input_shape=IMG, n_classes=2,
                       activity_regularizers=regs)
    v = spec.init_variables(jax.random.PRNGKey(0))
    path = str(tmp_path / "effb0.onnx")
    export_onnx(spec, v, path, batch_size=2)
    x = np.random.RandomState(0).randn(2, *IMG).astype(np.float32)
    ref = np.asarray(spec.module().apply(v, jnp.asarray(x), train=False))
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, ref, atol=5e-6)


@pytest.mark.parametrize("name", ["mobilenetv2", "xception"])
def test_export_import_roundtrip_depthwise_families(name, tmp_path):
    """Depthwise (mobilenetv2) and separable (xception) layer families
    round-trip with every leaf randomized: depthwise OIHW<->HWIO kernel
    folds, separable depthwise+pointwise entry pairing, decomposed-BN
    strategy-3 fills, and non-zero biases all come back bit-exactly."""
    import warnings

    spec = build_model(name, HP[name], IMG, 2)
    v = _randomize(spec.init_variables(jax.random.PRNGKey(0)), seed=17)
    path = str(tmp_path / f"{name}.onnx")
    export_onnx(spec, v, path, batch_size=2)
    fresh = spec.init_variables(jax.random.PRNGKey(42))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a partial-import warning = failure
        imported, _ = import_onnx_weights(path, fresh, graph=spec.graph,
                                          verbose=False)
    for col in ("params", "batch_stats"):
        flat_ref = jax.tree_util.tree_flatten_with_path(v[col])[0]
        flat_imp = dict(
            (jax.tree_util.keystr(k), a) for k, a in
            jax.tree_util.tree_flatten_with_path(imported[col])[0])
        for k, a in flat_ref:
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(flat_imp[jax.tree_util.keystr(k)]),
                err_msg=f"{col}{jax.tree_util.keystr(k)}")


def test_export_import_roundtrip(tmp_path):
    """Exported weights import back by layer name, bit-exactly (conv kernels
    fold to OIHW on the way out and back; biases survive the unfused
    Conv+Transpose+Add pattern)."""
    spec = build_model("cutoffvgg16", HP["cutoffvgg16"], IMG, 2)
    v1 = _randomize(spec.init_variables(jax.random.PRNGKey(0)), seed=7)
    path = str(tmp_path / "m.onnx")
    export_onnx(spec, v1, path)
    v2 = spec.init_variables(jax.random.PRNGKey(1))
    v_imp, copied = import_onnx_weights(path, v2, graph=spec.graph,
                                        verbose=False)
    assert copied == len(v1["params"])
    for layer, p in v1["params"].items():
        for key, arr in p.items():
            np.testing.assert_array_equal(
                np.asarray(arr), np.asarray(v_imp["params"][layer][key]),
                err_msg=f"{layer}/{key}")


def test_exported_file_serves_through_predictor(tmp_path):
    """Full outbound->inbound loop at the serving boundary: train-format
    checkpoint -> export ONNX -> Predictor.restore('.onnx') -> identical
    probabilities."""
    from ab_line_classifier_tpu.config import Config, load_config
    from ab_line_classifier_tpu.predict.predict import Predictor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = load_config(os.path.join(repo, "config.yml")).to_dict()
    d["DATA"]["IMG_DIM"] = [64, 64]
    d["TRAIN"]["MODEL_DEF"] = "cutoffvgg16"
    d["HPARAMS"]["CUTOFFVGG16"] = dict(HP["cutoffvgg16"])
    cfg = Config(d)

    spec = build_model("cutoffvgg16", HP["cutoffvgg16"], IMG, 2)
    v = _randomize(spec.init_variables(jax.random.PRNGKey(0)), seed=11)
    path = str(tmp_path / "m.onnx")
    export_onnx(spec, v, path)

    restored = Predictor.restore(path, cfg=cfg, compute_dtype=jnp.float32)
    direct = Predictor(spec, v, compute_dtype=jnp.float32)
    frames = np.random.RandomState(0).randint(
        0, 256, (4, *IMG)).astype(np.uint8)
    np.testing.assert_allclose(restored.predict_probs(frames),
                               direct.predict_probs(frames), atol=1e-6)


def test_export_cli_helper(tmp_path):
    """export_checkpoint drives restore->export for an .h5 checkpoint."""
    from ab_line_classifier_tpu.config import Config, load_config
    from ab_line_classifier_tpu.export import export_checkpoint
    from ab_line_classifier_tpu.models.weights import export_h5_weights

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = load_config(os.path.join(repo, "config.yml")).to_dict()
    d["DATA"]["IMG_DIM"] = [64, 64]
    d["TRAIN"]["MODEL_DEF"] = "cnn0"
    d["HPARAMS"]["CNN0"] = dict(HP["cnn0"])
    cfg = Config(d)

    spec = build_model("cnn0", HP["cnn0"], IMG, 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    h5 = str(tmp_path / "w.h5")
    export_h5_weights(h5, v)
    out = str(tmp_path / "m.onnx")
    export_checkpoint(h5, out, batch_size=2, cfg=cfg)

    x = np.random.RandomState(0).randn(2, *IMG).astype(np.float32)
    ref = np.asarray(spec.module().apply(v, jnp.asarray(x), train=False))
    got = evaluate(OP.load_model(out), {"input_1": x})[0]
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_export_import_roundtrip_batchnorm(tmp_path):
    """BN models round-trip: the exporter decomposes BatchNorm into
    arithmetic over anonymous reshaped constants (no BatchNormalization
    node), so the importer restores those layers from the named
    'model/<layer>/<leaf>:0' initializers (strategy 3). Every weighted
    layer must come back — a silently partial import serves wrong
    predictions."""
    import warnings

    from ab_line_classifier_tpu.models.onnx_weights import (
        import_onnx_weights)

    spec = build_model("cnn0", HP["cnn0"], IMG, 2)
    v = _randomize(spec.init_variables(jax.random.PRNGKey(0)), seed=13)
    path = str(tmp_path / "cnn0.onnx")
    export_onnx(spec, v, path, batch_size=2)

    fresh = spec.init_variables(jax.random.PRNGKey(42))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a partial-import warning = failure
        imported, copied = import_onnx_weights(path, fresh, graph=spec.graph)
    weighted = [s.name for s in spec.graph.layers
                if s.name in v["params"] or s.name in v.get("batch_stats", {})]
    assert copied == len(weighted)

    x = np.random.RandomState(0).randn(2, *IMG).astype(np.float32)
    ref = np.asarray(spec.module().apply(v, jnp.asarray(x), train=False))
    got = np.asarray(spec.module().apply(imported, jnp.asarray(x),
                                         train=False))
    np.testing.assert_array_equal(got, ref)


class _FnSpec:
    """Minimal spec-like wrapper to export an arbitrary jax function."""

    def __init__(self, fn, input_shape):
        self.input_shape = input_shape
        self._fn = fn

    def module(self):
        fn = self._fn

        class _M:
            @staticmethod
            def apply(v, x, train=False):
                return fn(v, x)

        return _M()


def test_deferred_expand_propagates_through_elementwise(tmp_path):
    """An op whose operands are ALL deferred broadcasts yields an
    under-sized ONNX tensor unless the deferral propagates to its output —
    a later reduction would then silently compute 1*(u+w) instead of
    B*H*(u+w)."""
    u = np.arange(4, dtype=np.float32) + 1.0
    w = np.arange(4, dtype=np.float32) * 0.5

    def fn(v, x):
        a = jnp.broadcast_to(v["params"]["p"]["u"], (2, 3, 4))
        b = jnp.broadcast_to(v["params"]["p"]["w"], (2, 3, 4))
        return jnp.sum(a + b, axis=(0, 1)) + 0.0 * jnp.sum(x)

    spec = _FnSpec(fn, (4,))
    v = {"params": {"p": {"u": jnp.asarray(u), "w": jnp.asarray(w)}}}
    path = str(tmp_path / "deferred.onnx")
    export_onnx(spec, v, path, batch_size=1)
    x = np.zeros((1, 4), np.float32)
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, 6.0 * (u + w), atol=1e-5)


def test_deferred_expand_survives_unary_ops(tmp_path):
    """Unary elementwise ops (Neg/Identity/Cast) keep a deferred broadcast
    deferred; a non-broadcasting consumer (Reshape) must still see the full
    shape."""
    u = np.arange(4, dtype=np.float32)

    def fn(v, x):
        a = -jnp.broadcast_to(v["params"]["p"]["u"], (2, 4))
        return jnp.reshape(a, (8,)) + 0.0 * jnp.sum(x)

    spec = _FnSpec(fn, (4,))
    v = {"params": {"p": {"u": jnp.asarray(u)}}}
    path = str(tmp_path / "unary.onnx")
    export_onnx(spec, v, path, batch_size=1)
    x = np.zeros((1, 4), np.float32)
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, np.tile(-u, 2), atol=1e-6)


def test_is_finite_exports_correctly(tmp_path):
    """lax.is_finite lowers to Not(Or(IsInf, IsNaN)) — a plain IsInf mapping
    would compute nearly the inverse (keep infinities, zero finite values)."""

    def fn(v, x):
        return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))

    spec = _FnSpec(fn, (4,))
    path = str(tmp_path / "isfinite.onnx")
    export_onnx(spec, {"params": {}}, path, batch_size=1)
    x = np.array([[1.0, np.inf, np.nan, -2.5]], np.float32)
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_array_equal(got, np.array([[1.0, 0.0, 0.0, -2.5]],
                                                np.float32))


def test_partial_onnx_import_warns(tmp_path):
    """Stripping a layer's named initializers from the file makes the import
    incomplete — that must WARN, not silently serve fresh-init weights."""
    from ab_line_classifier_tpu.models.onnx_weights import (
        import_onnx_weights)

    spec = build_model("cnn0", HP["cnn0"], IMG, 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    path = str(tmp_path / "cnn0.onnx")
    model = export_onnx(spec, v, path, batch_size=2)

    bn = [s.name for s in spec.graph.layers
          if s.name in v.get("batch_stats", {})][0]
    keep = [t for t in model.graph.initializer
            if f"/{bn}/" not in t.name]
    del model.graph.initializer[:]
    model.graph.initializer.extend(keep)
    stripped = str(tmp_path / "stripped.onnx")
    OP.save_model(model, stripped)

    fresh = spec.init_variables(jax.random.PRNGKey(42))
    with pytest.warns(UserWarning, match="partial ONNX import"):
        import_onnx_weights(stripped, fresh, graph=spec.graph)


def test_deferred_expand_crosses_inlined_call_boundary(tmp_path):
    """A deferred broadcast consumed inside an inlined sub-jaxpr (a
    jit-wrapped helper lowers to a pjit eqn) must carry its pending Expand
    across the call boundary: the inner invar binds to the same mid-shape
    tensor, so without propagation the inner Reshape reads an under-sized
    tensor."""
    u = np.arange(4, dtype=np.float32) + 1.0

    @jax.jit
    def inner(a):
        return jnp.reshape(a, (12,))

    def fn(v, x):
        a = jnp.broadcast_to(v["params"]["p"]["u"], (3, 4))
        return inner(a) + 0.0 * jnp.sum(x)

    spec = _FnSpec(fn, (4,))
    v = {"params": {"p": {"u": jnp.asarray(u)}}}
    path = str(tmp_path / "inline_in.onnx")
    export_onnx(spec, v, path, batch_size=1)
    x = np.zeros((1, 4), np.float32)
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, np.tile(u, 3), atol=1e-6)


def test_deferred_expand_crosses_inlined_output_boundary(tmp_path):
    """The mirror case: a deferral created INSIDE an inlined sub-jaxpr must
    follow the inner outvar onto the outer eqn output."""
    u = np.arange(4, dtype=np.float32) + 1.0

    @jax.jit
    def inner(w):
        return jnp.broadcast_to(w, (3, 4))

    def fn(v, x):
        return jnp.reshape(inner(v["params"]["p"]["u"]),
                           (12,)) + 0.0 * jnp.sum(x)

    spec = _FnSpec(fn, (4,))
    v = {"params": {"p": {"u": jnp.asarray(u)}}}
    path = str(tmp_path / "inline_out.onnx")
    export_onnx(spec, v, path, batch_size=1)
    x = np.zeros((1, 4), np.float32)
    got = evaluate(OP.load_model(path), {"input_1": x})[0]
    np.testing.assert_allclose(got, np.tile(u, 3), atol=1e-6)


def test_mixed_precision_checkpoint_exports(tmp_path):
    """A TRAIN.MIXED_PRECISION checkpoint exports: bf16 compute casts
    demote to f32 (like f64) instead of failing the export, and the f32
    graph evaluates close to the bf16 jax forward."""
    spec = build_model("cnn0", HP["cnn0"], (32, 32, 3), 2,
                       mixed_precision=True)
    v = spec.init_variables(jax.random.PRNGKey(5))
    model = export_onnx(spec, v, str(tmp_path / "mp.onnx"), batch_size=2)
    x = np.random.RandomState(5).rand(2, 32, 32, 3).astype(np.float32)
    got = evaluate(model, {model.graph.input[0].name: x})[0]
    ref = np.asarray(spec.module().apply(v, jnp.asarray(x), train=False))
    assert np.abs(got - ref).max() < 5e-3  # bf16-vs-f32 compute drift only
