"""Per-stage attribution harness (predict/attribution.py).

Successor (per-stage, device-side) to the reference's whole-model host
timer ``clock_avg_runtime`` (reference ``predict.py:425-448``). The load-
bearing claim is that each stage segment (graph ``cut`` + boundary
``override``) is EXACTLY that stage's serving computation — verified here
by chaining the segments and demanding the full forward bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.predict.attribution import (
    auto_boundaries, stage_segments)

HP_CNN0 = {"LR": 1e-3, "DROPOUT": 0.35, "L2_LAMBDA": 1e-4,
           "NODES_DENSE0": 16, "KERNEL_SIZE": 3, "STRIDES": 1,
           "MAXPOOL_SIZE": 2, "BLOCKS": 3, "INIT_FILTERS": 8,
           "FILTER_EXP_BASE": 2}
HP_MNV2 = {"LR": 1e-4, "DROPOUT": 0.35, "L2_LAMBDA": 1e-3,
           "NODES_DENSE0": 16, "FREEZE_IDX": 116, "CUTOFF_IDX": 115}


def test_auto_boundaries_cnn0():
    spec = build_model("cnn0", HP_CNN0, (32, 32, 3), 2)
    bounds = auto_boundaries(spec.graph)
    labels = [l for l, _ in bounds]
    assert labels == ["block0", "block1", "block2", "head"]
    assert bounds[-1][1] == spec.graph.output
    # boundaries are valid cut points in topological order
    idx = [spec.graph.index_of(b) for _, b in bounds[:-1]]
    assert idx == sorted(idx)


def test_auto_boundaries_mobilenetv2_skips_severing_cuts():
    """MobileNetV2's inverted-residual adds span block boundaries
    (block_N_project_BN -> block_{N+1}... -> block_{N+1}_add reads the
    previous block's output); every returned boundary must be a valid
    closure point, checked against graph.cut's own validation."""
    spec = build_model("mobilenetv2", HP_MNV2, (32, 32, 3), 2)
    bounds = auto_boundaries(spec.graph)
    assert len(bounds) >= 4
    for _, b in bounds[:-1]:
        spec.graph.cut(b)  # raises GraphError if attribution lied


def test_auto_boundaries_xception_lands_on_residual_joins():
    """Xception's stage outputs are UNTAGGED ``add_N`` residual joins (the
    block-tagged sepconvs feed them); boundaries must land on the joins —
    a boundary on the tagged sepconv is not a dominator, its override
    cannot be DCE'd, and the segment silently re-runs the whole prefix
    (the bug this test pins: per-stage FLOPs came out cumulative)."""
    spec = build_model("xception", {"LR": 0.01, "DROPOUT": 0.5,
                                    "L2_LAMBDA": 0.01, "FREEZE_IDX": -1},
                       (32, 32, 3), 2)
    bounds = dict(auto_boundaries(spec.graph))
    # middle-flow stages must resolve to their add_N join
    assert bounds["block5"].startswith("add")
    assert bounds["block10"].startswith("add")
    # entry/exit stages without residuals keep their tagged layer
    assert bounds["block14"] == "block14_sepconv2_act"


def test_auto_boundaries_custom_resnetv2_stage_tags():
    """custom_resnetv2 tags by ``stage{N}_unit{M}``; boundaries are the
    stage-final residual adds (the only dominators — every unit's add
    reads across its unit body)."""
    spec = build_model("custom_resnetv2",
                       {"LR": 4.6e-5, "DROPOUT0": 0.45, "DROPOUT1": 0.40,
                        "STRIDES": 1, "BLOCKS": 2, "INIT_FILTERS": 16},
                       (32, 32, 3), 2)
    bounds = auto_boundaries(spec.graph)
    assert len(bounds) >= 3
    dom_labels = [l for l, _ in bounds]
    # labels keep the model's own tag family (stageN, not blockN)
    assert dom_labels[0] == "stage0"
    assert dom_labels[-1] == "head"


def test_explicit_non_dominating_boundary_raises():
    """stage_segments must refuse a boundary a later layer reads across —
    the override could not be DCE'd and the segment would silently
    recompute the prefix."""
    spec = build_model("mobilenetv2", HP_MNV2, (32, 32, 3), 2)
    # block_2_depthwise feeds block_2_add only via the conv path; the add
    # also reads block_1_project_BN from before it -> not a dominator
    with pytest.raises(ValueError, match="does not dominate"):
        stage_segments(spec, [("bad", "block_2_expand"),
                              ("head", spec.graph.output)])


HP_XCEPTION = {"LR": 0.01, "DROPOUT": 0.5, "L2_LAMBDA": 0.01,
               "FREEZE_IDX": -1}


@pytest.mark.parametrize("model_name,hp", [("cnn0", HP_CNN0),
                                           ("mobilenetv2", HP_MNV2),
                                           ("xception", HP_XCEPTION)])
def test_segments_reproduce_full_forward(model_name, hp):
    """Chaining the stage segments == the full serving forward, bit for
    bit: proves the cut+override programs compute exactly their stage
    (no severed edge, no stale upstream, no double-applied layer)."""
    spec = build_model(model_name, hp, (32, 32, 3), 2)
    variables = spec.init_variables(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                    jnp.float32)

    full = spec.module().apply(variables, x, train=False)
    out = x
    for _label, _boundary, _prev, seg in stage_segments(spec):
        out = seg(variables, out)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))


@pytest.mark.parametrize("model_name,hp", [("cnn0", HP_CNN0),
                                           ("xception", HP_XCEPTION)])
def test_segment_flops_sum_to_full_program(model_name, hp):
    """XLA cost-analysis FLOPs of the segments sum to the full program's
    (boundary handoffs add bytes, not FLOPs) — the attribution accounts
    for the whole model ONCE: cumulative per-segment FLOPs (a segment
    recomputing its prefix because its input boundary didn't dominate)
    fail here, which is exactly how the Xception bug surfaced on-chip."""
    spec = build_model(model_name, hp, (32, 32, 3), 2)
    variables = spec.init_variables(jax.random.PRNGKey(0))
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)

    def flops_of(fn, *args):
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, list) else (cost or {})
        return float(cost.get("flops", 0.0))

    full = flops_of(
        lambda v, a: spec.module().apply(v, a, train=False), variables, x)
    segs = stage_segments(spec)
    rng = np.random.RandomState(0)
    cap = tuple(b for _, b, _p, _f in segs if b != spec.graph.output)
    mod_cap = spec.module(capture=cap)
    _, shapes = jax.eval_shape(
        lambda v, a: mod_cap.apply(v, a, train=False), variables, x)
    total = 0.0
    for _label, _boundary, prev, seg in segs:
        feed = (x if prev is None else jnp.asarray(
            rng.rand(*shapes[prev].shape), jnp.float32))
        total += flops_of(seg, variables, feed)
    assert full > 0
    assert abs(total - full) / full < 0.05, (total, full)
