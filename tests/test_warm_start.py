"""Pretrained warm-start for TRAINING (``USE_PRETRAINED`` +
``PATHS.PRETRAINED_WEIGHTS``).

The reference's core workflow builds every transfer model on ImageNet
weights (``/root/reference/src/models/models.py:59,110,161,206,398``) and
warm-starts from a saved Keras h5 via name-matched layer copy
(``/root/reference/src/train.py:236-238`` ->
``/root/reference/src/models/model_utils.py:6-23``). These tests pin the
TPU-native equivalent: ``train.experiment.load_pretrained_variables``
accepts native checkpoints, full-model Keras ``.h5``, and the
``keras.applications`` weights-only ``*_notop.h5`` layout (the ImageNet
backbone files), for both the serial trainer and the trial-parallel SPMD
overlay (``ParallelFoldTrainer.init_stacked(warm_start=...)``).

Fixture h5s randomize EVERY leaf before export (conftest.randomize_leaves;
the commit-2f1c997 lesson: fresh inits carry zero biases that hide
unbound-leaf importer bugs bit-exactly).
"""

import json
import os

import h5py
import jax
import numpy as np
import pytest

from ab_line_classifier_tpu.config import Config, load_config
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.models.weights import export_h5_weights
from ab_line_classifier_tpu.train.experiment import load_pretrained_variables
from conftest import REPO_ROOT, randomize_leaves


def _hparams(model_name):
    cfg = load_config(os.path.join(REPO_ROOT, "config.yml"))
    d = cfg.to_dict()
    d["TRAIN"]["MODEL_DEF"] = model_name
    return Config(d).model_hparams()


def _backbone_names(spec):
    """The layers a ``keras.applications`` notop file would carry: every
    parameterized layer except the classifier head stack."""
    head = {spec.logits_layer}
    out = []
    for name in spec.init_variables(jax.random.PRNGKey(0))["params"]:
        if name in head or "dense" in name or "output" in name:
            continue
        out.append(name)
    return out


def _make_notop_h5(full_h5, notop_h5, layer_names):
    """Subset a full-model export into the weights-only root-level layout
    keras.applications ships (layer groups at file root, ``layer_names``
    root attr, per-group ``weight_names`` attrs — copied verbatim)."""
    with h5py.File(full_h5, "r") as src, h5py.File(notop_h5, "w") as dst:
        root = src["model_weights"]
        kept = []
        for name in layer_names:
            src.copy(root[name], dst, name=name)
            kept.append(name.encode())
        dst.attrs["layer_names"] = kept
        dst.attrs["backend"] = np.bytes_(b"tensorflow")


def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.mark.parametrize("model_name", ["vgg16", "mobilenetv2"])
def test_notop_warm_start_backbone_only(tmp_path, model_name):
    """A notop-layout h5 (the ImageNet backbone file format) warm-starts
    every backbone layer bit-exactly and leaves the head at the exact fresh
    init the given rng would produce — so USE_PRETRAINED only changes
    covered layers. mobilenetv2 exercises the DepthwiseConv2D kernel
    transpose and BN moving-stat split."""
    spec = build_model(model_name, _hparams(model_name), (32, 32, 3), 2)
    donor = randomize_leaves(spec.init_variables(jax.random.PRNGKey(7)),
                             seed=5)
    full = str(tmp_path / "full.h5")
    notop = str(tmp_path / f"{model_name}_notop.h5")
    export_h5_weights(full, donor, graph=spec.graph)
    backbone = _backbone_names(spec)
    assert backbone, "backbone selection came up empty"
    _make_notop_h5(full, notop, backbone)

    rng = jax.random.PRNGKey(3)
    variables, names = load_pretrained_variables(notop, spec, rng=rng,
                                                 verbose=False)
    assert set(names) == set(backbone)

    fresh = spec.init_variables(rng)
    got_p, want_p = _flat(variables["params"]), _flat(donor["params"])
    fresh_p = _flat(fresh["params"])
    for key in got_p:
        layer = key.split("'")[1]
        if layer in backbone:
            np.testing.assert_array_equal(got_p[key], want_p[key], err_msg=key)
        else:
            np.testing.assert_array_equal(got_p[key], fresh_p[key],
                                          err_msg=key)
    if "batch_stats" in donor:
        got_bs, want_bs = _flat(variables["batch_stats"]), _flat(
            donor["batch_stats"])
        for key in got_bs:
            layer = key.split("'")[1]
            if layer in backbone:
                np.testing.assert_array_equal(got_bs[key], want_bs[key],
                                              err_msg=key)


def test_full_model_h5_warm_start_cutoffvgg16(tmp_path):
    """A full-model h5 (what the reference's USE_PRETRAINED consumes,
    reference train.py:236-238) restores EVERY parameterized layer,
    head included."""
    spec = build_model("cutoffvgg16", _hparams("cutoffvgg16"), (32, 32, 3),
                       2, total_epochs=4)
    donor = randomize_leaves(spec.init_variables(jax.random.PRNGKey(1)),
                             seed=9)
    path = str(tmp_path / "donor.h5")
    export_h5_weights(path, donor, graph=spec.graph)

    variables, names = load_pretrained_variables(path, spec, verbose=False)
    assert set(names) == set(donor["params"])
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(donor["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_checkpoint_latest_alias(tmp_path):
    """Native warm-start keeps checkpoint.resolve_model_dir semantics: a
    '.../latest' alias (the form config.yml ships for MODEL_TO_LOAD) and a
    dir-of-checkpoints both resolve to the newest model dir — the alias
    is not a literal path, so no existence pre-check may run before the
    resolver."""
    from ab_line_classifier_tpu.utils import checkpoint as ckpt

    spec = build_model("cnn0", _hparams("cnn0"), (32, 32, 3), 2)
    donor = randomize_leaves(spec.init_variables(jax.random.PRNGKey(4)),
                             seed=8)
    models = tmp_path / "models"
    ckpt.save_model(str(models / "model20260820-000000"), donor,
                    meta={"model_name": "cnn0"})

    for alias in (str(models / "latest"), str(models)):
        variables, names = load_pretrained_variables(alias, spec,
                                                     verbose=False)
        assert names is None  # native restore: full tree
        for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                        jax.tree_util.tree_leaves(donor["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_path_raises(tmp_path):
    """Reference model_utils.py:13 asserts the file exists; silently
    training from scratch after a config typo is a footgun."""
    spec = build_model("cnn0", _hparams("cnn0"), (32, 32, 3), 2)
    with pytest.raises(FileNotFoundError):
        load_pretrained_variables(str(tmp_path / "nope.h5"), spec,
                                  verbose=False)


def test_mismatched_architecture_raises(tmp_path):
    """An h5 from a different architecture matches zero layers -> error,
    not a silent from-scratch run."""
    vgg = build_model("vgg16", _hparams("vgg16"), (32, 32, 3), 2)
    donor = randomize_leaves(vgg.init_variables(jax.random.PRNGKey(0)))
    path = str(tmp_path / "vgg.h5")
    export_h5_weights(path, donor, graph=vgg.graph)
    cnn0 = build_model("cnn0", _hparams("cnn0"), (32, 32, 3), 2)
    with pytest.raises(ValueError, match="no layers matched"):
        load_pretrained_variables(path, cnn0, verbose=False)


def test_parallel_warm_start_overlay(tmp_path):
    """ParallelFoldTrainer.init_stacked broadcasts the warm-start layers
    identically into every fold (the reference hands the same
    pretrained_path to each fold's train_classifier) while uncovered layers
    keep distinct per-fold inits."""
    from ab_line_classifier_tpu.parallel.trial_parallel import (
        ParallelFoldTrainer)

    hp = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 8,
          "KERNEL_SIZE": 3, "STRIDES": 1, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
          "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}
    spec = build_model("cnn0", hp, (32, 32, 3), 2)
    donor = randomize_leaves(spec.init_variables(jax.random.PRNGKey(2)),
                             seed=4)
    path = str(tmp_path / "donor.h5")
    export_h5_weights(path, donor, graph=spec.graph)
    warm = load_pretrained_variables(path, spec, verbose=False)
    wvars, names = warm
    covered = [n for n in names if n != spec.logits_layer][0]

    F = 3
    trainer = ParallelFoldTrainer(spec, F, class_weights=np.ones((F, 2)),
                                  seed=0)
    params, batch_stats, _, _ = trainer.init_stacked(spec.phases[0],
                                                     warm_start=warm)
    k = np.asarray(params[covered]["kernel"])
    assert k.shape[0] == F
    for f in range(F):
        np.testing.assert_array_equal(
            k[f], np.asarray(wvars["params"][covered]["kernel"]))

    # Without warm start the per-fold inits differ — the overlay, not the
    # vmapped init, is what made the folds identical above.
    params0, _, _, _ = trainer.init_stacked(spec.phases[0])
    k0 = np.asarray(params0[covered]["kernel"])
    assert not np.array_equal(k0[0], k0[1])
    for f in range(F):
        assert not np.array_equal(k0[f], k[f])


@pytest.mark.slow
def test_keras3_weights_h5_warm_start(tmp_path):
    """A real Keras 3 ``model.save_weights('*.weights.h5')`` file (TF is
    installed for golden tests) warm-starts through the same config path —
    layer order mapping via graph=."""
    tf = pytest.importorskip("tensorflow")

    spec = build_model("vgg16", _hparams("vgg16"), (32, 32, 3), 2)
    keras_model = tf.keras.applications.VGG16(
        weights=None, include_top=False, input_shape=(32, 32, 3))
    rng = np.random.RandomState(0)
    for w in keras_model.weights:
        w.assign(rng.normal(0.1, 0.4, w.shape).astype("float32"))
    path = str(tmp_path / "vgg16.weights.h5")
    keras_model.save_weights(path)

    variables, names = load_pretrained_variables(path, spec, verbose=False)
    by_name = {layer.name: layer for layer in keras_model.layers}
    copied_convs = [n for n in names if n in by_name
                    and by_name[n].weights]
    assert len(copied_convs) == 13  # VGG16's conv stack
    for n in copied_convs:
        np.testing.assert_allclose(
            np.asarray(variables["params"][n]["kernel"]),
            by_name[n].get_weights()[0], rtol=0, atol=0, err_msg=n)


@pytest.mark.slow
def test_warm_start_beats_random_cutoffvgg16(tmp_path_factory):
    """The reference's core workflow — pretrained backbone -> freeze ->
    finetune — reproduced end to end: a converged donor's h5 warm-starts a
    ONE-epoch cutoffvgg16 run through USE_PRETRAINED to >= 0.9 held-out
    AUC, while the identically-configured scratch run's first epoch is
    clearly worse on val loss."""
    from ab_line_classifier_tpu.data.synthetic import generate_dataset
    from ab_line_classifier_tpu.train.experiment import perform_single_run
    from ab_line_classifier_tpu.utils import checkpoint as ckpt
    from conftest import derive_workspace_config

    ws = str(tmp_path_factory.mktemp("warm_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=16,
                                        clips_per_patient=2,
                                        frames_per_clip=6, hw=(32, 32),
                                        seed=11)
    base = derive_workspace_config(ws, fcsv, ccsv, fdir)
    base["TRAIN"]["DATA_AUG"] = {
        "ZOOM_RANGE": 0.0, "WIDTH_SHIFT_RANGE": 0.0,
        "HEIGHT_SHIFT_RANGE": 0.0, "ROTATION_RANGE": 0.0,
        "BRIGHTNESS_RANGE": 0.0, "HORIZONTAL_FLIP": False}
    base["TRAIN"].update({"MODEL_DEF": "cutoffvgg16", "BATCH_SIZE": 16,
                          "MIXED_PRECISION": False})
    base["HPARAMS"]["CUTOFFVGG16"].update({"LR_EXTRACT": 1e-3,
                                           "LR_FINETUNE": 1e-4,
                                           "DROPOUT": 0.3})

    # Donor: converged cutoffvgg16 (the convergence suite's recipe).
    d = json.loads(json.dumps(base))
    d["TRAIN"].update({"EPOCHS": 12, "PATIENCE": 12})
    d["HPARAMS"]["CUTOFFVGG16"]["EXTRACT_EPOCHS"] = 8
    d["PATHS"]["MODEL_WEIGHTS"] = ws + "/results/models_donor/"
    donor_result = perform_single_run(Config(d), save_weights=True,
                                      verbose=False)
    assert donor_result.test_metrics["macro_mean_auc"] >= 0.9
    donor_vars, _ = ckpt.load_model(donor_result.model_dir)
    spec = build_model("cutoffvgg16", Config(d).model_hparams(),
                       (32, 32, 3), 2, total_epochs=12)
    h5_path = ws + "/donor.h5"
    export_h5_weights(h5_path, donor_vars, graph=spec.graph)

    def one_epoch_run(use_pretrained):
        d = json.loads(json.dumps(base))
        d["TRAIN"].update({"EPOCHS": 1, "PATIENCE": 5,
                           "USE_PRETRAINED": use_pretrained})
        d["HPARAMS"]["CUTOFFVGG16"]["EXTRACT_EPOCHS"] = 1
        d["PATHS"]["PRETRAINED_WEIGHTS"] = h5_path
        tag = "warm" if use_pretrained else "cold"
        d["PATHS"]["MODEL_WEIGHTS"] = ws + f"/results/models_{tag}/"
        return perform_single_run(Config(d), save_weights=False,
                                  verbose=False)

    warm = one_epoch_run(True)
    cold = one_epoch_run(False)
    assert warm.test_metrics["macro_mean_auc"] >= 0.9, warm.test_metrics
    # Same seed, same data, same plan — only the warm start differs; the
    # converged donor weights must dominate a 1-epoch scratch head.
    assert warm.history[0].val["loss"] < cold.history[0].val["loss"], (
        warm.history[0].val, cold.history[0].val)


# ---------------------------------------------------------------------------
# Opt-in real-ImageNet parity (VERDICT r4 #6): activates only where the
# standard keras.applications VGG16 backbone file exists locally — no
# network is used. Drop the file in ~/.keras/models/ (Keras's own cache
# location) or point ABLC_IMAGENET_VGG16_H5 at it; see docs/OPTIONAL_DEPS.md.
# ---------------------------------------------------------------------------

_IMAGENET_VGG16 = "vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5"


def _find_imagenet_vgg16():
    cand = os.environ.get("ABLC_IMAGENET_VGG16_H5")
    if cand and os.path.isfile(cand):
        return cand
    cached = os.path.expanduser(os.path.join("~", ".keras", "models",
                                             _IMAGENET_VGG16))
    return cached if os.path.isfile(cached) else None


@pytest.mark.slow
@pytest.mark.skipif(_find_imagenet_vgg16() is None,
                    reason="real ImageNet VGG16 notop.h5 not present "
                           "locally (set ABLC_IMAGENET_VGG16_H5 or place "
                           "it in ~/.keras/models/); synthetic-fixture "
                           "coverage in test_notop_warm_start_backbone_only")
def test_real_imagenet_vgg16_warm_start_parity():
    """The published ImageNet backbone file (the exact file the reference
    downloads at models.py:59,398) imports through the warm-start path
    bit-identically to Keras's own loading of the same file."""
    path = _find_imagenet_vgg16()
    spec = build_model("cutoffvgg16", _hparams("cutoffvgg16"),
                       (128, 128, 3), 2)
    rng = jax.random.PRNGKey(0)
    variables, names = load_pretrained_variables(path, spec, rng=rng,
                                                 verbose=False)
    assert "block1_conv1" in names

    # golden: Keras's own loading of the very same file (TF is test-only)
    import tensorflow as tf

    keras_model = tf.keras.applications.VGG16(weights=path,
                                              include_top=False,
                                              input_shape=(128, 128, 3))
    for layer in keras_model.layers:
        if not layer.weights or layer.name not in names:
            continue
        kernel, bias = layer.get_weights()
        np.testing.assert_array_equal(
            np.asarray(variables["params"][layer.name]["kernel"]), kernel,
            err_msg=layer.name)
        np.testing.assert_array_equal(
            np.asarray(variables["params"][layer.name]["bias"]), bias,
            err_msg=layer.name)
