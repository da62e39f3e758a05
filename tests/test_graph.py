import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu import graph as G


def _tiny_graph():
    return G.graph_of(
        G.conv2d("c1", G.INPUT, 4, (3, 3)),
        G.batch_norm("bn1", "c1"),
        G.relu("a1", "bn1"),
        G.conv2d("c2", "a1", 8, (3, 3)),
        G.global_avg_pool("gap", "c2"),
        G.dense("logits", "gap", 2),
        G.softmax("out", "logits"),
    )


def test_topo_validation():
    with pytest.raises(G.GraphError):
        G.graph_of(G.conv2d("c1", "missing", 4, (3, 3)))


def test_duplicate_names_rejected():
    with pytest.raises(G.GraphError):
        G.graph_of(G.conv2d("c1", G.INPUT, 4, (3, 3)),
                   G.conv2d("c1", "c1", 4, (3, 3)))


def test_cut_semantics():
    g = _tiny_graph()
    # Keras-style index: 0 = input, 1 = c1, ...
    cut = g.cut(3)
    assert cut.output == "a1"
    assert cut.layer_names == [G.INPUT, "c1", "bn1", "a1"]
    cut2 = g.cut("c2")
    assert cut2.output == "c2"


def test_cut_at_input_rejected():
    with pytest.raises(G.GraphError):
        _tiny_graph().cut(0)


def test_last_layer_of_kind():
    g = _tiny_graph()
    assert g.last_layer_of_kind(G.KIND_CONV) == "c2"
    assert g.last_layer_of_kind(G.KIND_DENSE) == "logits"


def test_trainable_mask():
    g = _tiny_graph()
    # freeze through index 2 (c1, bn1); bn frozen regardless
    mask = g.trainable_mask(2)
    assert mask == {"c1": False, "bn1": False, "c2": True, "logits": True}
    mask_all = g.trainable_mask(-1)
    assert mask_all == {"c1": True, "bn1": False, "c2": True, "logits": True}
    mask_nobn = g.trainable_mask(-1, freeze_bn_always=False)
    assert mask_nobn["bn1"] is True


def test_trainable_mask_backbone_scope():
    """The reference applies freeze_layers to the BACKBONE model before the
    head attaches (models.py:82), so a FREEZE_IDX at/past the cutoff must
    never freeze head layers (model_utils.py:26-41 iterates base layers
    only). Here the tiny graph's first 3 layers (input, c1, bn1) play the
    backbone."""
    g = _tiny_graph()
    mask = g.trainable_mask(99, backbone_len=3)
    # everything in the 'backbone' (c1, bn1) frozen; 'head' (c2, logits)
    # trains even though 99 covers its indices
    assert mask == {"c1": False, "bn1": False, "c2": True, "logits": True}
    # BN freeze is backbone-scoped too
    assert g.trainable_mask(-1, backbone_len=2)["bn1"] is True


def test_freeze_idx_past_cutoff_trains_head():
    """mobilenetv2 with FREEZE_IDX raised past the cutoff: the head (fc0 /
    logits) must stay trainable, like Keras training the head of a fully
    frozen backbone."""
    from ab_line_classifier_tpu.models import build_model

    hp = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
          "CUTOFF_IDX": 115, "FREEZE_IDX": 118}
    spec = build_model("mobilenetv2", hp, (32, 32, 3), 2)
    mask = spec.phases[0].trainable
    assert mask["fc0"] is True and mask["logits"] is True
    assert not any(v for k, v in mask.items() if k not in ("fc0", "logits"))


def test_forward_and_capture():
    g = _tiny_graph()
    mod = G.GraphModule(graph=g, capture=("c2",))
    x = jnp.ones((2, 8, 8, 3))
    v = mod.init(jax.random.PRNGKey(0), x)
    (out, caps), _ = mod.apply(v, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
    assert out.shape == (2, 2)
    assert caps["c2"].shape == (2, 8, 8, 8)
    assert jnp.allclose(out.sum(-1), 1.0, atol=1e-5)


def test_params_flat_by_layer_name():
    g = _tiny_graph()
    mod = G.GraphModule(graph=g)
    v = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 3)))
    assert set(v["params"].keys()) == {"c1", "bn1", "c2", "logits"}
    assert set(v["batch_stats"].keys()) == {"bn1"}


def test_frozen_bn_runs_in_inference_mode():
    """BN listed in inference_bn behaves like Keras trainable=False BN: in
    training it normalizes with running stats and never updates them."""
    import jax.numpy as jnp

    g = G.graph_of(G.conv2d("c", G.INPUT, 4, (3, 3)),
                   G.batch_norm("b", "c"))
    live = G.GraphModule(graph=g)
    frozen = G.GraphModule(graph=g, inference_bn=("b",))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3),
                    jnp.float32)
    v = live.init(jax.random.PRNGKey(0), x)

    y_live, st_live = live.apply(v, x, train=True, mutable=["batch_stats"])
    y_frozen, st_frozen = frozen.apply(v, x, train=True,
                                       mutable=["batch_stats"])
    # live BN updated its moving stats; frozen did not
    assert not np.allclose(np.asarray(st_live["batch_stats"]["b"]["mean"]),
                           np.asarray(v["batch_stats"]["b"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(st_frozen["batch_stats"]["b"]["mean"]),
        np.asarray(v["batch_stats"]["b"]["mean"]))
    # frozen training output == inference output (running-stat normalization)
    y_eval = frozen.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_frozen), np.asarray(y_eval),
                               atol=1e-6)
    assert not np.allclose(np.asarray(y_frozen), np.asarray(y_live))


def test_frozen_bn_layers_per_model():
    """Only models whose reference builder calls freeze_layers freeze BN
    (mobilenetv2/vgg16/efficientnetb7); xception/cnn0/custom_resnetv2 train
    theirs (reference models.py:82,135,229 vs :153-196,248-296,298-384)."""
    from ab_line_classifier_tpu.models import build_model

    mn = build_model("mobilenetv2", {"LR": 1e-4, "DROPOUT": 0.35,
                                     "L2_LAMBDA": 1e-3, "NODES_DENSE0": 8,
                                     "FREEZE_IDX": 116, "CUTOFF_IDX": 115},
                     (96, 96, 3), 2)
    frozen = mn.frozen_bn_layers(mn.phases[0])
    n_bn = sum(1 for s in mn.graph.layers if s.kind == G.KIND_BN)
    assert len(frozen) == n_bn > 0

    cn = build_model("cnn0", {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 0.0,
                              "NODES_DENSE0": 8, "KERNEL_SIZE": 3,
                              "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
                              "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2},
                     (32, 32, 3), 2)
    assert cn.frozen_bn_layers(cn.phases[0]) == ()
    assert cn.phases[0].trainable["bn_block0"] is True


def test_cut_out_of_range_raises():
    """Keras raises IndexError on base.layers[idx] (reference models.py:79);
    silently returning the full graph on a CUTOFF_IDX typo would train the
    wrong architecture."""
    import pytest

    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.graph import GraphError

    hp = {"LR": 0.01, "DROPOUT": 0.5, "L2_LAMBDA": 0.01, "NODES_DENSE0": 8,
          "FREEZE_IDX": -1}
    spec = build_model("vgg16", hp, (32, 32, 3), 2)
    g = spec.graph
    with pytest.raises(GraphError, match="out of range"):
        g.cut(len(g.layers) + 50)


def test_normalization_zero_variance_stays_finite():
    """Keras layers.Normalization floors the denominator at
    backend.epsilon(); a zero-variance channel must not produce inf/NaN."""
    import jax
    import numpy as np

    from ab_line_classifier_tpu import graph as G

    spec = G.normalization("norm", "in", mean=[0.5, 0.0, 1.0],
                           variance=[0.25, 0.0, 1.0])
    mod = spec.module_fn("norm")
    x = np.ones((2, 4, 4, 3), np.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(v, x))
    assert np.isfinite(out).all()
