"""h5 weight import round-trip and name matching."""

import jax
import numpy as np
import pytest

from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.models.weights import (export_h5_weights,
                                                   import_h5_weights)
from tests.conftest import randomize_leaves

HP = {"LR_EXTRACT": 3e-4, "LR_FINETUNE": 9.3e-6, "DROPOUT": 0.45,
      "CUTOFF_LAYER": 10, "FINETUNE_LAYER": 7, "EXTRACT_EPOCHS": 6}


def test_h5_roundtrip_cutoffvgg16(tmp_path):
    spec = build_model("cutoffvgg16", HP, (64, 64, 3), 2)
    # EVERY leaf randomized: fresh inits have zero biases on both sides,
    # which would hide a bias-skipping importer bit-exactly (CLAUDE.md;
    # commit 2f1c997).
    v1 = randomize_leaves(spec.init_variables(jax.random.PRNGKey(0)), seed=3)
    v2 = spec.init_variables(jax.random.PRNGKey(1))

    h5_path = str(tmp_path / "w.h5")
    export_h5_weights(h5_path, v1)
    v2_imported, copied = import_h5_weights(h5_path, v2, verbose=False)

    assert copied == len(v1["params"])
    for layer, p in v1["params"].items():
        for k, arr in p.items():
            np.testing.assert_array_equal(
                np.asarray(arr), np.asarray(v2_imported["params"][layer][k]))


def test_partial_match_skips_missing(tmp_path):
    spec = build_model("cutoffvgg16", HP, (64, 64, 3), 2)
    v1 = randomize_leaves(spec.init_variables(jax.random.PRNGKey(0)), seed=4)
    h5_path = str(tmp_path / "w.h5")
    export_h5_weights(h5_path, v1)

    # A different architecture: only same-named layers with matching shapes
    # get copied (the reference's try/except name-matched copy).
    hp2 = dict(HP, CUTOFF_LAYER=7)  # shorter backbone, different channels
    spec2 = build_model("cutoffvgg16", hp2, (64, 64, 3), 2)
    v2 = spec2.init_variables(jax.random.PRNGKey(2))
    v2_imported, copied = import_h5_weights(h5_path, v2, verbose=False)
    assert 0 < copied <= len(v2["params"])
    np.testing.assert_array_equal(
        np.asarray(v1["params"]["block1_conv1"]["kernel"]),
        np.asarray(v2_imported["params"]["block1_conv1"]["kernel"]))


def test_normalization_stats_roundtrip(tmp_path):
    """Stats-only layers (keras Normalization, EfficientNet stem) must
    survive export->import — they have no params entry."""
    import jax.numpy as jnp

    from ab_line_classifier_tpu import graph as G

    g = G.graph_of(
        G.normalization("normalization", G.INPUT,
                        mean=(0.1, 0.2, 0.3), variance=(1.0, 2.0, 3.0)),
        G.conv2d("conv", "normalization", 4, (3, 3)))
    mod = G.GraphModule(graph=g)
    v1 = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    h5_path = str(tmp_path / "w.h5")
    export_h5_weights(h5_path, v1)

    # re-init with different stats; import must restore the originals
    g2 = G.graph_of(
        G.normalization("normalization", G.INPUT,
                        mean=(0.0, 0.0, 0.0), variance=(1.0, 1.0, 1.0)),
        G.conv2d("conv", "normalization", 4, (3, 3)))
    v2 = G.GraphModule(graph=g2).init(jax.random.PRNGKey(1),
                                      jnp.zeros((1, 8, 8, 3)))
    v2_imported, copied = import_h5_weights(h5_path, v2, verbose=False)
    assert copied == 2  # conv + normalization
    np.testing.assert_allclose(
        np.asarray(v2_imported["batch_stats"]["normalization"]["mean"]),
        [0.1, 0.2, 0.3])
    np.testing.assert_allclose(
        np.asarray(v2_imported["batch_stats"]["normalization"]["variance"]),
        [1.0, 2.0, 3.0])


def test_bn_stats_roundtrip(tmp_path):
    hp = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
          "KERNEL_SIZE": 3, "STRIDES": 1, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
          "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}
    spec = build_model("cnn0", hp, (32, 32, 3), 2)
    # every leaf randomized (scale/bias/var included), so any skipped BN
    # leaf shows up as a mismatch instead of comparing constants
    v1 = randomize_leaves(spec.init_variables(jax.random.PRNGKey(0)), seed=5)
    h5_path = str(tmp_path / "w.h5")
    export_h5_weights(h5_path, v1)

    v2 = spec.init_variables(jax.random.PRNGKey(1))
    v2_imported, _ = import_h5_weights(h5_path, v2, verbose=False)
    for k in ("mean", "var"):
        np.testing.assert_array_equal(
            np.asarray(v2_imported["batch_stats"]["bn_block0"][k]),
            np.asarray(v1["batch_stats"]["bn_block0"][k]))
    for k in ("scale", "bias"):
        np.testing.assert_array_equal(
            np.asarray(v2_imported["params"]["bn_block0"][k]),
            np.asarray(v1["params"]["bn_block0"][k]))


def test_head_dense_alias_output(tmp_path):
    """Reference checkpoints name the head Dense 'output'
    (models.py:418,376) or auto 'dense' (cnn0); the importer aliases it to
    our 'logits' by name + kernel-shape match."""
    import h5py

    spec = build_model("cutoffvgg16", HP, (64, 64, 3), 2)
    v1 = randomize_leaves(spec.init_variables(jax.random.PRNGKey(0)), seed=6)
    h5_path = str(tmp_path / "ref.h5")
    export_h5_weights(h5_path, v1)
    # rename the exported 'logits' group to the reference's 'output'
    with h5py.File(h5_path, "r+") as f:
        f["model_weights"].move("logits", "output")
        f["model_weights"]["output"].move("logits", "output")

    v2 = spec.init_variables(jax.random.PRNGKey(1))
    v2_imported, copied = import_h5_weights(h5_path, v2, verbose=False)
    assert copied == len(v1["params"])
    for k in ("kernel", "bias"):
        np.testing.assert_array_equal(
            np.asarray(v1["params"]["logits"][k]),
            np.asarray(v2_imported["params"]["logits"][k]))


def test_head_dense_alias_collision_picks_true_head(tmp_path):
    """A donor carrying BOTH an auto-named hidden 'dense' and head
    'dense_1' whose kernel shapes collide (NODES_DENSE0 == n_classes with
    matching input dims) must resolve 'logits' to the TRUE head — Keras
    numbers auto-named layers in creation order and the reference always
    creates the head last (models.py:287), so the highest-suffix dense
    wins, deterministically, not whichever an alias list tried first."""
    import h5py

    hidden_kernel = np.arange(16, dtype=np.float32).reshape(4, 4)
    head_kernel = -np.arange(16, dtype=np.float32).reshape(4, 4) - 100.0
    head_bias = np.array([1.0, -2.0, 3.0, -4.0], np.float32)
    h5_path = str(tmp_path / "collide.h5")
    with h5py.File(h5_path, "w") as f:
        root = f.create_group("model_weights")
        for name, kernel, bias in (
                ("dense", hidden_kernel, np.zeros(4, np.float32)),
                ("dense_1", head_kernel, head_bias)):
            g = root.create_group(name).create_group(name)
            g.create_dataset("kernel:0", data=kernel)
            g.create_dataset("bias:0", data=bias)
        root.attrs["layer_names"] = [b"dense", b"dense_1"]

    variables = {"params": {"logits": {
        "kernel": np.zeros((4, 4), np.float32),
        "bias": np.full(4, 9.0, np.float32)}}}
    out, copied = import_h5_weights(h5_path, variables, verbose=False)
    assert copied == 1
    np.testing.assert_array_equal(out["params"]["logits"]["kernel"],
                                  head_kernel)
    np.testing.assert_array_equal(out["params"]["logits"]["bias"],
                                  head_bias)

    # explicit reference head names ('output') still outrank auto names
    with h5py.File(h5_path, "r+") as f:
        f["model_weights"].move("dense_1", "output")
        f["model_weights"]["output"].move("dense_1", "output")
    out, copied = import_h5_weights(h5_path, variables, verbose=False)
    assert copied == 1
    np.testing.assert_array_equal(out["params"]["logits"]["kernel"],
                                  head_kernel)


def test_graphless_export_grayscale_conv_not_depthwise(tmp_path):
    """A (h, w, 1, C) kernel is AMBIGUOUS without a graph — a plain conv on
    a 1-channel (grayscale) input has the same shape as a depthwise kernel
    (this repo's own U-Net, models/unet.py, takes (128,128,1) input). The
    graphless heuristic must only call it depthwise when the layer name
    follows the zoo's depthwise convention; otherwise it exports a plain
    ``kernel:0`` Keras can bind by name."""
    import h5py

    rng = np.random.RandomState(0)
    variables = {"params": {
        # grayscale first conv — shape-ambiguous, name says plain conv
        "enc0_conv1": {"kernel": rng.randn(3, 3, 1, 16).astype(np.float32),
                       "bias": rng.randn(16).astype(np.float32)},
        # genuine depthwise (mobilenet naming) — same ambiguous shape class
        "block_1_depthwise": {
            "kernel": rng.randn(3, 3, 1, 32).astype(np.float32)},
    }}
    h5_path = str(tmp_path / "gray.h5")
    # The ambiguous-but-unnamed layer is exported as a plain conv AND
    # announced (an out-of-zoo DepthwiseConv2D would land here silently).
    with pytest.warns(UserWarning, match="shape-ambiguous"):
        export_h5_weights(h5_path, variables)
    def _names(attr):
        return [n.decode() if isinstance(n, bytes) else str(n) for n in attr]

    with h5py.File(h5_path, "r") as f:
        conv_names = _names(
            f["model_weights"]["enc0_conv1"].attrs["weight_names"])
        dw_names = _names(
            f["model_weights"]["block_1_depthwise"].attrs["weight_names"])
    assert conv_names == ["enc0_conv1/kernel:0", "enc0_conv1/bias:0"]
    assert dw_names == ["block_1_depthwise/depthwise_kernel:0"]

    # And the round trip restores the grayscale conv bit-exactly.
    v2 = {"params": {
        "enc0_conv1": {"kernel": np.zeros((3, 3, 1, 16), np.float32),
                       "bias": np.zeros(16, np.float32)},
        "block_1_depthwise": {"kernel": np.zeros((3, 3, 1, 32), np.float32)},
    }}
    v2_imported, copied = import_h5_weights(h5_path, v2, verbose=False)
    assert copied == 2
    np.testing.assert_array_equal(
        np.asarray(v2_imported["params"]["enc0_conv1"]["kernel"]),
        variables["params"]["enc0_conv1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(v2_imported["params"]["block_1_depthwise"]["kernel"]),
        variables["params"]["block_1_depthwise"]["kernel"])


def test_partial_layer_failure_is_atomic(tmp_path):
    """A layer whose h5 arrays are PARTIALLY wrong (one good array, one
    wrong-shape) must be skipped WHOLE: no leaf of that layer may change
    (stage-and-commit, same discipline as the Keras-3 import path), other
    layers still import, and copied excludes it."""
    import h5py

    h5_path = str(tmp_path / "torn.h5")
    good_kernel = np.arange(3 * 3 * 4 * 8, dtype=np.float32).reshape(
        3, 3, 4, 8)
    good_gamma = np.arange(8, dtype=np.float32) + 1.0
    with h5py.File(h5_path, "w") as f:
        root = f.create_group("model_weights")
        g = root.create_group("conv_ok").create_group("conv_ok")
        g.create_dataset("kernel:0", data=good_kernel)
        b = root.create_group("bn_torn").create_group("bn_torn")
        b.create_dataset("gamma:0", data=good_gamma)          # good shape
        b.create_dataset("moving_mean:0",                     # good shape
                         data=np.arange(8, dtype=np.float32) + 10.0)
        b.create_dataset("beta:0", data=np.zeros(5, np.float32))  # WRONG
        root.attrs["layer_names"] = [b"conv_ok", b"bn_torn"]

    # Pre-import values deliberately NOT fresh-init constants (mean!=0,
    # var!=1, scale!=1): constant inits would hide an early-commit
    # regression bit-exactly (the 2f1c997 lesson, see CLAUDE.md).
    fresh_scale = np.full(8, 7.0, np.float32)
    fresh_mean = np.full(8, 5.5, np.float32)
    fresh_var = np.full(8, 2.25, np.float32)
    variables = {
        "params": {
            "conv_ok": {"kernel": np.zeros((3, 3, 4, 8), np.float32)},
            "bn_torn": {"scale": fresh_scale.copy(),
                        "bias": np.full(8, 3.0, np.float32)},
        },
        "batch_stats": {"bn_torn": {"mean": fresh_mean.copy(),
                                    "var": fresh_var.copy()}},
    }
    out, copied = import_h5_weights(h5_path, variables, verbose=False)
    assert copied == 1  # only conv_ok
    np.testing.assert_array_equal(out["params"]["conv_ok"]["kernel"],
                                  good_kernel)
    # bn_torn untouched IN FULL — gamma AND moving_mean were importable
    # but the layer's beta was not, so nothing may have committed: not
    # the params half, not the batch_stats half.
    np.testing.assert_array_equal(out["params"]["bn_torn"]["scale"],
                                  fresh_scale)
    np.testing.assert_array_equal(out["params"]["bn_torn"]["bias"],
                                  np.full(8, 3.0, np.float32))
    np.testing.assert_array_equal(out["batch_stats"]["bn_torn"]["mean"],
                                  fresh_mean)
    np.testing.assert_array_equal(out["batch_stats"]["bn_torn"]["var"],
                                  fresh_var)
