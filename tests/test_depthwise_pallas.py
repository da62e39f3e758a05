"""Pallas depthwise-conv kernel: parity vs XLA's grouped conv, vmap (the
trial-parallel trainer vmaps whole models over folds), gradients (custom_vjp
delegates to the XLA path), and dispatch gating.

The kernel runs in interpreter mode here (CPU backend); the compiled
TPU path is exercised by scripts/depthwise_pallas_bench.py and the serving
benchmarks (docs/PERFORMANCE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu.ops.depthwise_pallas import (
    _lax_reference, _pallas_forward, depthwise_conv,
    depthwise_conv_interpret)


@pytest.mark.parametrize("shape,K", [
    ((3, 16, 16, 96), 3),    # C < 128: one padded lane tile
    ((2, 8, 8, 200), 5),     # 5x5 (efficientnetb7 blocks), ragged C tile
    ((5, 9, 7, 64), 3),      # odd H/W
    ((1, 32, 32, 128), 3),   # exact lane tile
    ((70, 4, 4, 256), 3),    # many frames per block + batch remainder
])
def test_matches_lax_reference(shape, K):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((K, K, 1, shape[-1])) * 0.2,
                    jnp.float32)
    got = depthwise_conv_interpret(x, k)
    want = _lax_reference(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bf16_matches_lax_bf16():
    """bf16 inputs, f32 accumulation — same semantics as XLA's conv."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 12, 12, 96)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 96)) * 0.2, jnp.bfloat16)
    got = depthwise_conv_interpret(x, k).astype(jnp.float32)
    want = _lax_reference(x, k).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=1e-2)


def test_vmap_over_fold_axis():
    """ParallelFoldTrainer vmaps the model over folds; the kernel must
    batch."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 2, 12, 12, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 3, 3, 1, 64)) * 0.2, jnp.float32)
    got = jax.vmap(lambda a, b: _pallas_forward(a, b, interpret=True))(x, k)
    want = jax.vmap(_lax_reference)(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_grad_bit_identical_to_lax():
    """custom_vjp backward IS the XLA path — gradients match exactly."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 32)) * 0.2, jnp.float32)

    gx, gk = jax.grad(lambda a, b: jnp.sum(depthwise_conv(a, b) ** 2),
                      argnums=(0, 1))(x, k)
    rx, rk = jax.grad(lambda a, b: jnp.sum(_lax_reference(a, b) ** 2),
                      argnums=(0, 1))(x, k)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(rx))
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(rk))


def test_unsupported_configs_fall_back():
    """stride-2 / VALID (the zero-padded stage reductions) take the XLA
    path and stay correct."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 17, 17, 48)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 48)) * 0.2, jnp.float32)
    got = depthwise_conv(x, k, 2, "VALID")
    want = _lax_reference(x, k, 2, "VALID")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_env_gate(monkeypatch):
    """The kernel is opt-in (it measured at 0.5-1.0x XLA on TPU v5e —
    module docstring): default is the XLA path, ABLC_DEPTHWISE=pallas
    enables it on TPU only."""
    from ab_line_classifier_tpu.ops import depthwise_pallas as dp

    monkeypatch.delenv("ABLC_DEPTHWISE", raising=False)
    assert dp._use_pallas() is False
    monkeypatch.setenv("ABLC_DEPTHWISE", "pallas")
    assert dp._use_pallas() is (jax.default_backend() == "tpu")
