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
    # reference config values: ROTATION_RANGE 45 = +-45 full turns
    x = _batch()
    out = augment_batch(x, jax.random.PRNGKey(1), zoom=0.1, shift_w=0.2,
                        shift_h=0.2, rotation=45, brightness=0.3,
                        horizontal_flip=True)
    assert out.shape == x.shape
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 255.0


def test_deterministic_given_key():
    x = _batch()
    kw = dict(zoom=0.1, rotation=30, horizontal_flip=True)
    a = augment_batch(x, jax.random.PRNGKey(7), **kw)
    b = augment_batch(x, jax.random.PRNGKey(7), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(x, jax.random.PRNGKey(8), **kw)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_pure_translation_moves_content():
    """Keras RandomTranslation semantics: shift ranges are FRACTIONS of the
    image dimensions, and the sampled shift moves content (not the sampling
    window) in the +shift direction. A bright center pixel must land at
    center + shift for every sample."""
    from ab_line_classifier_tpu.data.augment import (_affine_from_parts,
                                                     _sample_parts)

    n, size = 16, 33
    x = np.zeros((n, size, size, 3), np.float32)
    x[:, 16, 16] = 255.0
    key = jax.random.PRNGKey(0)
    out = np.asarray(augment_batch(jnp.asarray(x), key, shift_w=0.3,
                                   shift_h=0.3))
    # Recover the exact sampled shifts (same key path as augment_batch).
    k_affine, _ = jax.random.split(key)
    theta, zooms, tx, ty, flip = _sample_parts(
        k_affine, n, (size, size), zoom=0.0, shift_w=0.3, shift_h=0.3,
        rotation=0.0, horizontal_flip=False)
    tx, ty = np.asarray(tx), np.asarray(ty)
    assert np.abs(tx).max() > 2.0  # fractions scaled by dims: real pixels
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float64)
    for i in range(n):
        # Full-image intensity centroid: exact for the bilinear 4-tap
        # spread (thresholding would bias it by dropping low-weight taps).
        wgt = out[i, :, :, 0].astype(np.float64)
        cy = (wgt * ys).sum() / wgt.sum()
        cx = (wgt * xs).sum() / wgt.sum()
        assert abs(cx - (16 + tx[i])) < 0.02, i
        assert abs(cy - (16 + ty[i])) < 0.02, i


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


def test_zoom_direction_matches_keras():
    """Keras RandomZoom: output->input scale z in [1-f, 1+f]; z > 1 means a
    LARGER source region is sampled (zoomed out), so a centered bright spot
    stays centered and corners go toward fill for z < 1."""
    from ab_line_classifier_tpu.data.augment import (_affine_from_parts,
                                                     _bilinear_sample)

    x = np.zeros((17, 17, 3), np.float32)
    x[:, :] = 100.0
    # zoom OUT (z=1.5): input coords of the output corners run outside the
    # source -> zero fill appears at the corners.
    aff = np.asarray(_affine_from_parts(
        jnp.zeros((1,)), jnp.full((1,), 1.5), jnp.zeros((1,)),
        jnp.zeros((1,)), jnp.ones((1,)), (17, 17)))[0]
    out = np.asarray(_bilinear_sample(jnp.asarray(x), jnp.asarray(aff)))
    assert out[0, 0, 0] == 0.0 and out[8, 8, 0] == 100.0
    # zoom IN (z=0.5): everything stays inside -> no fill anywhere.
    aff = np.asarray(_affine_from_parts(
        jnp.zeros((1,)), jnp.full((1,), 0.5), jnp.zeros((1,)),
        jnp.zeros((1,)), jnp.ones((1,)), (17, 17)))[0]
    out = np.asarray(_bilinear_sample(jnp.asarray(x), jnp.asarray(aff)))
    assert (out > 0).all()


def test_brightness_is_absolute_delta():
    """BRIGHTNESS_RANGE is tf.image.stateless_random_brightness max_delta:
    an absolute gray-level shift (reference preprocessor.py:84-103), so 0.3
    moves pixel values by at most 0.3 — NOT 0.3*255."""
    x = jnp.full((8, 8, 8, 3), 128.0)
    out = np.asarray(augment_batch(x, jax.random.PRNGKey(2),
                                   brightness=0.3))
    assert np.abs(out - 128.0).max() <= 0.3 + 1e-5
    assert np.abs(out - 128.0).max() > 0.0


def test_config_plumbing():
    cfg = {"ZOOM_RANGE": 0.1, "HORIZONTAL_FLIP": True,
           "WIDTH_SHIFT_RANGE": 0.2, "HEIGHT_SHIFT_RANGE": 0.2,
           "SHEAR_RANGE": 10, "ROTATION_RANGE": 45, "BRIGHTNESS_RANGE": 0.3}
    p = affine_params_from_config(cfg)
    assert p["rotation"] == 45  # Keras fraction-of-2pi factor, verbatim
    out = augment_from_config(_batch(), jax.random.PRNGKey(0), cfg)
    assert out.shape == (4, 32, 32, 3)


def test_rotation_covers_all_quadrants():
    """ROTATION_RANGE 45 (the reference's value) must produce effectively
    arbitrary angles — content must land rotated beyond +-45 deg for some
    samples (the old 'degrees' reading capped at +-45)."""
    # A horizontal bright bar through the center.
    x = np.zeros((32, 17, 17, 3), np.float32)
    x[:, 8, :, :] = 255.0
    out = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(5),
                                   rotation=45))

    def bar_angle_deg(im):
        wgt = im[:, :, 0]
        tot = wgt.sum()
        ys, xs = np.mgrid[0:17, 0:17].astype(np.float64)
        mx, my = (wgt * xs).sum() / tot, (wgt * ys).sum() / tot
        mu20 = (wgt * (xs - mx) ** 2).sum() / tot
        mu02 = (wgt * (ys - my) ** 2).sum() / tot
        mu11 = (wgt * (xs - mx) * (ys - my)).sum() / tot
        return np.degrees(0.5 * np.arctan2(2 * mu11, mu20 - mu02))

    angles = np.array([abs(bar_angle_deg(out[i])) for i in range(32)
                       if out[i].sum() > 1000])
    # Uniform angles: a meaningful fraction must exceed 45 deg from
    # horizontal (impossible under the old 'ROTATION_RANGE in degrees'
    # reading, which capped at +-45).
    assert (angles > 50).any()


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


def test_quarter_decomposition_matches_gather_oracle():
    """Arbitrary-angle warps via rot90-peel + matmul residual must agree
    with the 4-tap gather sampler using the full-angle affine, for angles
    in every quadrant (incl. multi-turn angles and flip/zoom/translate)."""
    from ab_line_classifier_tpu.data.augment import (
        _affine_from_parts, _bilinear_sample, _warp_quarter_decomposed)

    yy, xx = np.mgrid[0:33, 0:33].astype(np.float32)
    img = np.stack([100 + 50 * np.sin(xx / 5) + 40 * np.cos(yy / 7)] * 3,
                   axis=-1).astype(np.float32)
    degs = [0, 30, 80, 100, 170, 200, 260, 350, -80, -200, 725]
    b = len(degs)
    theta = jnp.asarray(np.deg2rad(degs).astype(np.float32))
    zooms = jnp.asarray(np.linspace(0.9, 1.1, b).astype(np.float32))
    tx = jnp.asarray(np.linspace(-2, 2, b).astype(np.float32))
    ty = jnp.asarray(np.linspace(1.5, -1.5, b).astype(np.float32))
    flip = jnp.asarray(([1.0, -1.0] * b)[:b])
    images = jnp.asarray(np.stack([img] * b))

    got = np.asarray(_warp_quarter_decomposed(images, theta, zooms, tx, ty,
                                              flip))
    affs = _affine_from_parts(theta, zooms, tx, ty, flip, (33, 33))
    want = np.asarray(jax.vmap(_bilinear_sample)(images, affs))
    assert np.abs(got - want).mean() < 1.0      # sub-pixel kernel diffs
    assert np.abs(got - want).max() < 30.0      # fill-boundary pixels only


def test_large_rotation_non_square_falls_back_to_gather():
    """Non-square images cannot rot90-peel (shape changes); arbitrary-angle
    rotation must still produce finite, in-range output via the gather
    sampler."""
    x = np.random.RandomState(0).rand(4, 24, 32, 3).astype(np.float32) * 255
    out = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(0),
                                   rotation=45.0))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_extreme_zoom_range_stays_finite():
    """ZOOM_RANGE: 1.0 is valid Keras RandomZoom config (zooms span
    [0, 2]); the matmul warp's a22 = cos*zoom hits 0 there, so the
    dispatcher must route such ranges to the gather sampler — outputs
    stay finite and in range instead of NaN/zero-collapsed."""
    x = _batch()
    out = np.asarray(augment_batch(x, jax.random.PRNGKey(11), zoom=1.0,
                                   rotation=45, horizontal_flip=True))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0
    # Zoomed-in samples must carry real content, not all-fill.
    assert (out.reshape(len(out), -1).max(1) > 0).any()
