"""Whole-zoo Grad-CAM: the fused pass works for every MODEL_DEF.

The explain CLI serves whatever TRAIN.MODEL_DEF is configured, so the
last-conv tap (reference gradcam.py:33-38 scans layers for 'Conv') and the
fused forward+vjp program must handle every layer family in the zoo —
depthwise+residual (mobilenetv2), separable convs (xception),
pre-activation bottlenecks (custom_resnetv2), BN+fused-relu (cnn0), plain
conv stacks (vgg16/cutoffvgg16) — not just the cnn0 the unit tests use.
Per model, both modes run and the fused probabilities must equal a plain
forward pass (capturing the conv tap cannot perturb the forward).

Same zoo/hparams as the ONNX export suite, PLUS the full efficientnetb7
(55 compound-scaled blocks — silu/SE/stochastic-depth on the graph IR).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ab_line_classifier_tpu.config import Config, load_config
from ab_line_classifier_tpu.explain.gradcam import GradCAMExplainer
from ab_line_classifier_tpu.models import build_model
from conftest import REPO_ROOT
from test_onnx_export import HP, IMG, ZOO

import os

pytestmark = pytest.mark.slow


def _cfg(name):
    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["DATA"]["IMG_DIM"] = [IMG[0], IMG[1]]
    d["TRAIN"]["MODEL_DEF"] = name
    return Config(d)


@pytest.mark.parametrize("name", ZOO + ["efficientnetb7"])
def test_fused_gradcam_runs_for_every_model(name):
    spec = build_model(name, HP[name], IMG, 2)
    variables = spec.init_variables(jax.random.PRNGKey(3))
    frames = np.random.RandomState(7).randint(
        0, 256, (2,) + IMG).astype(np.uint8)

    # Reference forward once; EVERY mode's fused probs must match it (the
    # fused pass must not perturb the forward computation on any
    # architecture — same invariant test_gradcam pins for cnn0).
    from ab_line_classifier_tpu.ops.image import fused_preprocess

    x = fused_preprocess(jnp.asarray(frames), out_hw=IMG[:2],
                         preprocess_mode=spec.preprocess_mode)
    plain = np.asarray(spec.module().apply(variables, x, train=False))

    for mode in ("normal", "plusplus"):
        ex = GradCAMExplainer(_cfg(name), spec=spec, variables=variables,
                              mode=mode)
        probs, cams = ex.explain_frames(frames)
        assert probs.shape == (2, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        assert cams.shape == (2, IMG[0], IMG[1])
        assert np.isfinite(cams).all()
        assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6
        np.testing.assert_allclose(probs, plain, atol=1e-5,
                                   err_msg=f"mode={mode}")
