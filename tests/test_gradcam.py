"""Grad-CAM unit tests: fused pass correctness properties."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from ab_line_classifier_tpu.config import Config, load_config
from ab_line_classifier_tpu.explain.gradcam import GradCAMExplainer, jet_colormap
from ab_line_classifier_tpu.models import build_model

import os

from tests.conftest import REPO_ROOT


HP = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
      "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
      "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}


def _cfg(img=32):
    cfg = load_config(os.path.join(REPO_ROOT, "config.yml"))
    d = cfg.to_dict()
    d["DATA"]["IMG_DIM"] = [img, img]
    d["TRAIN"]["MODEL_DEF"] = "cnn0"
    return Config(d)


@pytest.fixture(scope="module")
def explainer_pair():
    cfg = _cfg()
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    normal = GradCAMExplainer(cfg, spec=spec, variables=v, mode="normal")
    plusplus = GradCAMExplainer(cfg, spec=spec, variables=v, mode="plusplus")
    return normal, plusplus


def test_fused_pass_properties(explainer_pair):
    normal, plusplus = explainer_pair
    frames = np.random.RandomState(0).randint(
        0, 256, (3, 32, 32, 3)).astype(np.uint8)
    probs, cams = normal.explain_frames(frames)
    assert probs.shape == (3, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert cams.shape == (3, 32, 32)
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6
    # Per-image normalization happens at conv resolution (reference order:
    # normalize then resize), so the upsampled peak is near-but-not-exactly 1.
    for c in cams:
        assert c.max() > 0.5 or c.max() == 0.0


def test_plusplus_differs_from_normal(explainer_pair):
    normal, plusplus = explainer_pair
    frames = np.random.RandomState(1).randint(
        0, 256, (2, 32, 32, 3)).astype(np.uint8)
    _, cams_n = normal.explain_frames(frames)
    _, cams_p = plusplus.explain_frames(frames)
    assert not np.allclose(cams_n, cams_p)


def test_probs_match_plain_forward(explainer_pair):
    """The fused pass's probabilities equal a plain forward pass (capturing
    + vjp must not perturb the forward computation)."""
    normal, _ = explainer_pair
    frames = np.random.RandomState(2).randint(
        0, 256, (2, 32, 32, 3)).astype(np.uint8)
    probs_fused, _ = normal.explain_frames(frames)

    from ab_line_classifier_tpu.ops.image import fused_preprocess
    x = fused_preprocess(jnp.asarray(frames), out_hw=(32, 32),
                         preprocess_mode=normal.spec.preprocess_mode)
    plain = np.asarray(normal.spec.module().apply(
        normal.variables, x, train=False))
    np.testing.assert_allclose(probs_fused, plain, atol=1e-5)


def test_plusplus_matches_closed_form_oracle(explainer_pair):
    """Grad-CAM++ oracle (Chattopadhay et al. 2018, eq. 19 with the standard
    gradient-power form): alpha = g^2 / (2 g^2 + sum_ab A_ab g^3),
    w_k = sum_ij alpha_ij * relu(g_ij), computed here per-frame with explicit
    ``jax.grad`` powers through the model head — independently of the fused
    batched vjp pass — and asserted equal at 1e-5. 'Differs from normal' alone
    would also pass for a wrong formula; this pins the formula itself. The
    reference config promises this mode but never implemented it
    (/root/reference/config.yml:195-197), so the oracle is the only check."""
    from ab_line_classifier_tpu import graph as G
    from ab_line_classifier_tpu.ops.image import fused_preprocess

    _, plusplus = explainer_pair
    spec, variables = plusplus.spec, plusplus.variables
    conv = spec.last_conv_layer
    head_module = spec.module()
    cut_module = G.GraphModule(graph=spec.graph.cut(conv))

    frames = np.random.RandomState(3).randint(
        0, 256, (2, 32, 32, 3)).astype(np.uint8)
    probs_fused, cams_fused = plusplus.explain_frames(frames)

    x = fused_preprocess(jnp.asarray(frames), out_hw=(32, 32),
                         preprocess_mode=spec.preprocess_mode)
    a = cut_module.apply(variables, x, train=False)

    cams_oracle = []
    for i in range(len(frames)):
        cls_i = int(np.argmax(probs_fused[i]))

        def score(a_single):
            probs = head_module.apply(variables, x[i:i + 1], train=False,
                                      overrides={conv: a_single[None]})
            return probs[0, cls_i]

        a_i = a[i]
        g = jax.grad(score)(a_i)                       # [h, w, C]
        g2 = g * g
        g3 = g2 * g
        denom = 2.0 * g2 + jnp.sum(a_i * g3, axis=(0, 1), keepdims=True)
        alpha = jnp.where(jnp.abs(denom) > 1e-12, g2 / denom, 0.0)
        w = jnp.sum(alpha * jax.nn.relu(g), axis=(0, 1))   # [C]
        cam = jax.nn.relu(jnp.einsum("hwc,c->hw", a_i, w))
        cam = cam / jnp.maximum(jnp.max(cam), 1e-12)
        cam = jax.image.resize(cam, (32, 32), "bilinear")
        cams_oracle.append(np.asarray(cam))

    np.testing.assert_allclose(cams_fused, np.stack(cams_oracle), atol=1e-5)


def test_jet_colormap():
    x = np.array([0.0, 0.5, 1.0])
    rgb = jet_colormap(x)
    assert rgb.shape == (3, 3)
    assert rgb.dtype == np.uint8
    # low -> blue-ish, high -> red-ish
    assert rgb[0, 2] > rgb[0, 0]
    assert rgb[2, 0] > rgb[2, 2]


def test_overlay_blend(explainer_pair):
    normal, _ = explainer_pair
    orig = np.full((32, 32, 3), 100, np.uint8)
    cam = np.zeros((32, 32), np.float32)
    out = normal.heatmap_overlay(orig, cam)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8
