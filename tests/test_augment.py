import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.data.augment import (
    affine_params_from_config, augment_batch, augment_from_config)


def _batch(n=4, h=32, w=32):
    return jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (n, h, w, 3)), jnp.float32)


def test_identity_when_disabled():
    x = _batch()
    out = augment_batch(x, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_output_range_and_shape():
    x = _batch()
    out = augment_batch(x, jax.random.PRNGKey(1), zoom=0.1, shift_w=0.2,
                        shift_h=0.2, rotation_deg=45, brightness=0.3,
                        horizontal_flip=True)
    assert out.shape == x.shape
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 255.0


def test_deterministic_given_key():
    x = _batch()
    kw = dict(zoom=0.1, rotation_deg=30, horizontal_flip=True)
    a = augment_batch(x, jax.random.PRNGKey(7), **kw)
    b = augment_batch(x, jax.random.PRNGKey(7), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(x, jax.random.PRNGKey(8), **kw)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_pure_translation_moves_content():
    # A bright pixel at center shifts by the translation amount.
    x = np.zeros((1, 33, 33, 3), np.float32)
    x[0, 16, 16] = 255.0
    # With shift ranges ~0 the affine is near-identity; use brightness=0.
    out = augment_batch(jnp.asarray(x), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_flip_only_is_mirror():
    x = _batch(n=64)  # enough samples that both flip outcomes occur
    out = np.asarray(augment_batch(x, jax.random.PRNGKey(3),
                                   horizontal_flip=True))
    xs = np.asarray(x)
    mirrored = xs[:, :, ::-1]
    matches_orig = np.all(np.isclose(out, xs, atol=1e-3), axis=(1, 2, 3))
    matches_mirror = np.all(np.isclose(out, mirrored, atol=1e-3), axis=(1, 2, 3))
    assert np.all(matches_orig | matches_mirror)
    assert matches_orig.any() and matches_mirror.any()


def test_config_plumbing():
    cfg = {"ZOOM_RANGE": 0.1, "HORIZONTAL_FLIP": True,
           "WIDTH_SHIFT_RANGE": 0.2, "HEIGHT_SHIFT_RANGE": 0.2,
           "SHEAR_RANGE": 10, "ROTATION_RANGE": 45, "BRIGHTNESS_RANGE": 0.3}
    p = affine_params_from_config(cfg)
    assert p["rotation_deg"] == 45
    out = augment_from_config(_batch(), jax.random.PRNGKey(0), cfg)
    assert out.shape == (4, 32, 32, 3)


def test_matmul_resample_matches_gather_reference():
    """The two-pass tent-matmul resampler agrees with the direct 4-tap
    gather implementation (kept as the reference oracle): exactly for
    separable maps, and to sub-pixel interpolation differences for
    rotations (the two-pass kernel blends rows at per-row x positions)."""
    import jax
    import jax.numpy as jnp

    from ab_line_classifier_tpu.data.augment import (_affine_resample_matmul,
                                                     _bilinear_sample)

    rng = np.random.RandomState(0)
    # smooth image: sub-pixel kernel differences stay small
    yy, xx = np.mgrid[0:48, 0:40].astype(np.float32)
    img = np.stack([100 + 50 * np.sin(xx / 7) + 40 * np.cos(yy / 9)] * 3,
                   axis=-1).astype(np.float32)

    # separable map (zoom + translate, no rotation): exact agreement
    aff = np.array([[1.1, 0.0, -3.2], [0.0, 0.9, 2.5]], np.float32)
    got = np.asarray(_affine_resample_matmul(jnp.asarray(img),
                                             jnp.asarray(aff)))
    want = np.asarray(_bilinear_sample(jnp.asarray(img), jnp.asarray(aff)))
    np.testing.assert_allclose(got, want, atol=1e-3)

    # rotation: sub-pixel kernel difference only
    th = np.deg2rad(17.0)
    aff = np.array([[np.cos(th), np.sin(th), 1.0],
                    [-np.sin(th), np.cos(th), -2.0]], np.float32)
    got = np.asarray(_affine_resample_matmul(jnp.asarray(img),
                                             jnp.asarray(aff)))
    want = np.asarray(_bilinear_sample(jnp.asarray(img), jnp.asarray(aff)))
    assert np.abs(got - want).mean() < 1.0
    assert np.abs(got - want).max() < 25.0  # edges/fill boundary only


def test_large_rotation_falls_back_to_gather():
    """ROTATION_RANGE >= 60 deg exceeds the matmul warp's a22 bound; the
    gather sampler must take over with finite, in-range output."""
    import jax
    import jax.numpy as jnp

    from ab_line_classifier_tpu.data.augment import augment_batch

    x = np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32) * 255
    out = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(0),
                                   rotation_deg=90.0))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0
