import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu.models import build_model, get_model, get_preprocess_mode

HP = {
    "cutoffvgg16": {"LR_EXTRACT": 3e-4, "LR_FINETUNE": 9.3e-6, "DROPOUT": 0.45,
                    "CUTOFF_LAYER": 10, "FINETUNE_LAYER": 7, "EXTRACT_EPOCHS": 6},
    "cnn0": {"LR": 1e-3, "DROPOUT": 0.35, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 64,
             "KERNEL_SIZE": 3, "STRIDES": 1, "MAXPOOL_SIZE": 2, "BLOCKS": 2,
             "INIT_FILTERS": 8, "FILTER_EXP_BASE": 2},
    "custom_resnetv2": {"LR": 4.6e-5, "DROPOUT0": 0.45, "DROPOUT1": 0.4,
                        "STRIDES": 1, "BLOCKS": 1, "INIT_FILTERS": 8},
    "mobilenetv2": {"LR": 1e-4, "DROPOUT": 0.35, "L2_LAMBDA": 1e-3,
                    "NODES_DENSE0": 32, "FREEZE_IDX": 116, "CUTOFF_IDX": 115},
}

IMG = (64, 64, 3)  # small spatial dims keep CPU tests fast


@pytest.mark.parametrize("name", ["cutoffvgg16", "cnn0", "custom_resnetv2"])
def test_forward_softmax(name):
    spec = build_model(name, HP[name], IMG, 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, *IMG), jnp.float32)
    out = spec.module().apply(v, x, train=False)
    assert out.shape == (2, 2)
    assert np.allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_cutoffvgg16_keras_parity():
    """Cutoff at CUTOFF_LAYER=10 keeps VGG16 through block3_conv3 and the
    param count matches the Keras original exactly."""
    spec = build_model("cutoffvgg16", HP["cutoffvgg16"], (128, 128, 3), 2,
                       total_epochs=30)
    assert spec.last_conv_layer == "block3_conv3"
    v = spec.init_variables(jax.random.PRNGKey(0))
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert n == 1_736_002  # keras Model([vgg16.layers[1:10]], GAP, Dense(2))
    # Phase plan: extract 6 epochs all-backbone-frozen; finetune unfreezes
    # backbone list indices >= 7 (block3_conv2, block3_conv3).
    extract, finetune = spec.phases
    assert extract.epochs == 6
    assert finetune.epochs == 25  # EPOCHS - EXTRACT_EPOCHS + 1
    assert not any(extract.trainable[f"block{b}_conv{c}"]
                   for b, cs in ((1, (1, 2)), (2, (1, 2)), (3, (1, 2, 3)))
                   for c in cs)
    assert extract.trainable["logits"]
    assert finetune.trainable["block3_conv2"]
    assert finetune.trainable["block3_conv3"]
    assert not finetune.trainable["block3_conv1"]


def test_mobilenetv2_cutoff_index():
    """CUTOFF_IDX=115 lands on block_12_add in the Keras layer list."""
    spec = build_model("mobilenetv2", HP["mobilenetv2"], (128, 128, 3), 2)
    assert spec.graph.output != "out_relu"  # cut before the top
    assert spec.graph.layers[115].name == "block_12_add"
    # FREEZE_IDX=116 > last backbone index: entire backbone frozen, head trains.
    phase = spec.phases[0]
    assert phase.trainable["logits"]
    assert not phase.trainable["Conv1"]
    assert not phase.trainable["block_12_project"]


def test_registry_fallback():
    assert get_preprocess_mode("not_a_model") == "tf"  # cnn0 fallback
    builder, prep = get_model("vgg16")
    x = jnp.ones((1, 2, 2, 3)) * 255.0
    y = prep(x)
    # caffe mode: BGR swap + mean subtract
    assert np.allclose(np.asarray(y[0, 0, 0]),
                       [255 - 103.939, 255 - 116.779, 255 - 123.68], atol=1e-3)


def test_output_bias_initializer():
    bias = np.log([3.0, 1 / 3.0]).astype(np.float32)
    spec = build_model("cnn0", HP["cnn0"], IMG, 2, output_bias=bias)
    v = spec.init_variables(jax.random.PRNGKey(0))
    got = np.asarray(v["params"]["logits"]["bias"])
    assert np.allclose(got, bias, atol=1e-6)


def test_logits_module_matches_softmax():
    spec = build_model("cnn0", HP["cnn0"], IMG, 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).rand(3, *IMG), jnp.float32)
    probs = spec.module().apply(v, x, train=False)
    logits = spec.logits_module().apply(v, x, train=False)
    assert np.allclose(np.asarray(jax.nn.softmax(logits, -1)),
                       np.asarray(probs), atol=1e-6)


def test_kernel_init_matches_keras_glorot_uniform():
    """Layers without an explicit initializer must use Keras's default
    glorot_uniform (bounded at sqrt(6/(fan_in+fan_out))), not flax's
    unbounded lecun_normal — from-scratch runs must start from the
    reference's weight distribution (reference models.py uses Keras
    defaults everywhere except cnn0's he_uniform)."""
    import jax

    from ab_line_classifier_tpu.models import build_model

    hp = {"LR": 0.01, "DROPOUT": 0.5, "L2_LAMBDA": 0.01, "NODES_DENSE0": 8,
          "FREEZE_IDX": -1}
    spec = build_model("vgg16", hp, (32, 32, 3), 2)
    v = spec.init_variables(jax.random.PRNGKey(0))
    k = np.asarray(v["params"]["block1_conv1"]["kernel"])  # (3,3,3,64)
    fan_in, fan_out = 3 * 3 * 3, 3 * 3 * 64
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    assert np.abs(k).max() <= limit + 1e-6          # bounded (uniform)
    assert np.abs(k).max() > 0.9 * limit            # actually fills range
    # uniform(-limit, limit) std = limit/sqrt(3)
    assert abs(k.std() - limit / np.sqrt(3)) < 0.1 * limit

    logits = np.asarray(v["params"]["logits"]["kernel"])   # Dense default
    lim_d = np.sqrt(6.0 / (logits.shape[0] + logits.shape[1]))
    assert np.abs(logits).max() <= lim_d + 1e-6
