import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from ab_line_classifier_tpu.ops import morphology as M


def test_dilate_erode_match_scipy():
    rng = np.random.RandomState(0)
    mask = (rng.rand(2, 48, 48) > 0.5).astype(np.float32)
    for size in (3, 5, 9):
        k = M.ellipse_kernel(size)
        d = np.asarray(M.binary_dilate(jnp.asarray(mask), jnp.asarray(k)))
        d_ref = np.stack([ndimage.binary_dilation(m, structure=k.astype(bool))
                          for m in mask]).astype(np.float32)
        np.testing.assert_array_equal(d, d_ref)
        e = np.asarray(M.binary_erode(jnp.asarray(mask), jnp.asarray(k)))
        e_ref = np.stack([ndimage.binary_erosion(m, structure=k.astype(bool),
                                                 border_value=1)
                          for m in mask]).astype(np.float32)
        np.testing.assert_array_equal(e, e_ref)


def test_dilate_erode_match_cv2_even_and_odd():
    """Bit-parity with cv2.morphologyEx windows for EVEN structuring elements
    too: cv2 anchors at ``k // 2`` unflipped, so the SAME-pad split is
    ``(k // 2, (k - 1) // 2)`` — one pixel off from the usual convention.
    The real automask path uses an even 24x24 ellipse for 480-row clips
    (reference auto_masking.py:58-61), where the odd-only scipy test above
    cannot see the shift."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    mask = (rng.rand(2, 48, 48) > 0.5).astype(np.float32)
    for size in (3, 4, 6, 24):
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
        np.testing.assert_array_equal(M.ellipse_kernel(size),
                                      k.astype(np.float32), err_msg=f"{size}")
        d = np.asarray(M.binary_dilate(jnp.asarray(mask),
                                       jnp.asarray(k, jnp.float32)))
        d_ref = np.stack([cv2.dilate(m.astype(np.uint8), k) for m in mask])
        np.testing.assert_array_equal(d.astype(np.uint8), d_ref,
                                      err_msg=f"dilate {size}")
        e = np.asarray(M.binary_erode(jnp.asarray(mask),
                                      jnp.asarray(k, jnp.float32)))
        e_ref = np.stack([cv2.erode(m.astype(np.uint8), k) for m in mask])
        np.testing.assert_array_equal(e.astype(np.uint8), e_ref,
                                      err_msg=f"erode {size}")


def test_ellipse_kernel_shapes():
    assert M.ellipse_kernel(1).shape == (1, 1)
    k3 = M.ellipse_kernel(3)
    assert k3.shape == (3, 3)
    assert k3[1, 1] == 1  # center always set
    k9 = M.ellipse_kernel(9)
    assert k9[0, 0] == 0  # corners outside the ellipse


def test_ellipse_kernel_matches_cv2_goldens():
    """Bit-exact vs cv2.getStructuringElement(MORPH_ELLIPSE, (n, n)) — the
    reference's automask kernels (auto_masking.py:58-61). Goldens captured
    from cv2 4.x in a clean process (cv2 cannot be imported after jax in
    this suite); cv2's 3x3 'ellipse' is the 5-px cross, NOT a full box —
    a smooth inside-the-ellipse test gets every size wrong."""
    goldens = {
        3: np.array([[0, 1, 0],
                     [1, 1, 1],
                     [0, 1, 0]], np.float32),
        5: np.array([[0, 0, 1, 0, 0],
                     [1, 1, 1, 1, 1],
                     [1, 1, 1, 1, 1],
                     [1, 1, 1, 1, 1],
                     [0, 0, 1, 0, 0]], np.float32),
        7: np.array([[0, 0, 0, 1, 0, 0, 0],
                     [0, 1, 1, 1, 1, 1, 0],
                     [1, 1, 1, 1, 1, 1, 1],
                     [1, 1, 1, 1, 1, 1, 1],
                     [1, 1, 1, 1, 1, 1, 1],
                     [0, 1, 1, 1, 1, 1, 0],
                     [0, 0, 0, 1, 0, 0, 0]], np.float32),
        9: np.array([[0, 0, 0, 0, 1, 0, 0, 0, 0],
                     [0, 1, 1, 1, 1, 1, 1, 1, 0],
                     [0, 1, 1, 1, 1, 1, 1, 1, 0],
                     [1, 1, 1, 1, 1, 1, 1, 1, 1],
                     [1, 1, 1, 1, 1, 1, 1, 1, 1],
                     [1, 1, 1, 1, 1, 1, 1, 1, 1],
                     [0, 1, 1, 1, 1, 1, 1, 1, 0],
                     [0, 1, 1, 1, 1, 1, 1, 1, 0],
                     [0, 0, 0, 0, 1, 0, 0, 0, 0]], np.float32),
    }
    for n, want in goldens.items():
        np.testing.assert_array_equal(M.ellipse_kernel(n), want,
                                      err_msg=f"size {n}")
    # Pixel-count goldens for larger / even sizes (cv2 4.x).
    for n, total in ((12, 115), (24, 469), (6, 29), (15, 169)):
        assert int(M.ellipse_kernel(n).sum()) == total, n


def test_clean_masks_pipeline():
    probs = np.zeros((3, 64, 64), np.float32)
    probs[:, 16:48, 16:48] = 0.9  # solid beam square
    out = np.asarray(M.clean_masks(jnp.asarray(probs), erode_size=3,
                                   dilate_size=5, threshold=0.4))
    assert out.shape == (3, 64, 64)
    assert out[:, 30, 30].min() == 1.0   # interior survives
    assert out[:, 0, 0].max() == 0.0     # background stays empty


def test_majority_average_mask():
    masks = np.zeros((10, 32, 32), np.float32)
    masks[:8, 8:24, 8:24] = 1.0  # 8/10 frames agree
    masks[8:, 0:4, 0:4] = 1.0    # 2/10 outlier region
    avg = np.asarray(M.majority_average_mask(jnp.asarray(masks)))
    assert avg[16, 16] == 1.0
    assert avg[1, 1] == 0.0


def test_majority_average_mask_tie_passes():
    """Exact ties (== n/2, even n) count as mask support: the reference
    leaves them at the nonzero value n/2, which passes bitwise_and and
    joins the bounding box (auto_masking.py:89-91)."""
    masks = np.zeros((2, 32, 32), np.float32)
    masks[0, 4:28, 4:28] = 1.0  # 1/2 frames -> smoothed interior == n/2
    avg = np.asarray(M.majority_average_mask(jnp.asarray(masks)))
    assert avg[16, 16] == 1.0


def test_bounding_box():
    m = np.zeros((20, 30))
    m[5:10, 12:18] = 1
    assert M.bounding_box(m) == (5, 9, 12, 17)
    assert M.bounding_box(np.zeros((4, 4))) == (0, 3, 0, 3)
