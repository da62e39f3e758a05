"""Fuzz the vectorized clip-aggregation ops against NumPy oracles that
implement the reference's Python loops verbatim (predict.py:283-308,365-376,
163-164)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu.ops import clip_aggregation as agg

from tests.conftest import REPO_ROOT


def ref_max_run(preds):
    mx = cur = 0
    for p in preds:
        cur = cur + 1 if p == 1 else 0
        mx = max(mx, cur)
    return mx


def ref_sliding(probs, w):
    mx = 0.0
    for i in range(0, probs.shape[0] - w + 1):
        mx = max(mx, np.mean(probs[i:i + w, 1]))
    return np.array([1.0 - mx, mx])


def _padded(probs, tmax=48):
    t = probs.shape[0]
    pp = np.zeros((1, tmax, 2), np.float32)
    pp[0, :t] = probs
    m = np.zeros((1, tmax), np.float32)
    m[0, :t] = 1
    return jnp.asarray(pp), jnp.asarray(m)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_all_algorithms(seed):
    rng = np.random.RandomState(seed)
    for _ in range(40):
        t = rng.randint(1, 40)
        probs = rng.rand(t, 2).astype(np.float32)
        probs[:, 0] = 1 - probs[:, 1]
        thresh = rng.rand()
        w = rng.randint(1, 10)
        ct = rng.randint(1, 6)
        pp, m = _padded(probs)

        b = (probs[:, 1] > thresh).astype(int)
        want = int(ref_max_run(b) >= ct)
        got = np.asarray(agg.contiguous_clip_probs(pp, ct, thresh, m))[0]
        assert got[1] == want
        assert got[0] == 1 - want

        want_s = ref_sliding(probs, w)
        got_s = np.asarray(agg.sliding_window_clip_probs(pp, w, m))[0]
        np.testing.assert_allclose(got_s, want_s, atol=1e-5)

        got_a = np.asarray(agg.average_clip_probs(pp, m))[0]
        np.testing.assert_allclose(got_a, probs.mean(0), atol=1e-5)


def test_max_contiguous_known_values():
    x = jnp.asarray([[1, 1, 0, 1, 1, 1, 0, 1]], jnp.int32)
    assert int(agg.max_contiguous_positive(x)[0]) == 3
    x = jnp.asarray([[0, 0, 0]], jnp.int32)
    assert int(agg.max_contiguous_positive(x)[0]) == 0
    x = jnp.asarray([[1, 1, 1]], jnp.int32)
    assert int(agg.max_contiguous_positive(x)[0]) == 3


def test_contiguity_run_broken_by_padding():
    # Padding must not extend a run across the clip boundary.
    probs = np.zeros((1, 6, 2), np.float32)
    probs[0, :, 1] = [0.9, 0.9, 0, 0, 0.9, 0.9]  # two runs of 2 within mask
    mask = np.array([[1, 1, 1, 1, 1, 0]], np.float32)  # last 0.9 is padding
    out = np.asarray(agg.contiguous_clip_probs(
        jnp.asarray(probs), 2, 0.5, jnp.asarray(mask)))[0]
    assert out[1] == 1.0  # first run of 2 qualifies
    out = np.asarray(agg.contiguous_clip_probs(
        jnp.asarray(probs), 3, 0.5, jnp.asarray(mask)))[0]
    assert out[1] == 0.0  # no run of 3 among valid frames


def test_sliding_window_shorter_than_window():
    # Reference: loop body never runs -> max stays 0 -> [1, 0].
    probs = np.full((1, 3, 2), 0.9, np.float32)
    mask = np.array([[1, 1, 1]], np.float32)
    out = np.asarray(agg.sliding_window_clip_probs(
        jnp.asarray(probs), 5, jnp.asarray(mask)))[0]
    np.testing.assert_allclose(out, [1.0, 0.0])


def test_aggregate_dispatch():
    probs = jnp.asarray(np.random.RandomState(0).rand(3, 10, 2), jnp.float32)
    mask = jnp.ones((3, 10), jnp.float32)
    for algo in ("average", "contiguous", "sliding_window"):
        out = agg.aggregate_clips(probs, mask, algorithm=algo,
                                  classification_threshold=0.5,
                                  contiguity_threshold=2, window=3)
        assert out.shape == (3, 2)
    with pytest.raises(ValueError):
        agg.aggregate_clips(probs, mask, algorithm="median")


def test_class_idx_map_mismatch_warns(tmp_path):
    """A CLASS_NAME_MAP file that disagrees with DATA.CLASSES order means
    the probability-column reads (and therefore every prediction label)
    are wrong — that must warn loudly, not silently invert (the reference
    inherits the inversion silently, predict.py:82-86)."""
    import json
    import os
    import warnings

    from ab_line_classifier_tpu.config import load_config
    from ab_line_classifier_tpu.predict.predict import load_class_idx_map

    cfg = load_config(os.path.join(REPO_ROOT, "config.yml"))
    d = cfg.to_dict()

    good = str(tmp_path / "map.json")
    with open(good, "w") as f:
        json.dump({c: i for i, c in enumerate(cfg.classes)}, f)
    d["PATHS"]["CLASS_NAME_MAP"] = good
    from ab_line_classifier_tpu.config import Config
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning on a matching map
        m = load_class_idx_map(Config(d))
    assert m == {c: i for i, c in enumerate(cfg.classes)}

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump({c: i for i, c in
                   enumerate(reversed(cfg.classes))}, f)
    d["PATHS"]["CLASS_NAME_MAP"] = bad
    with pytest.warns(UserWarning, match="disagrees with DATA.CLASSES"):
        load_class_idx_map(Config(d))


def test_unmatched_clip_raises():
    """A clip with zero matching frame rows is a frames/clips table
    mismatch: it must fail loudly (an all-padding row would silently score
    as a confident negative — average [0,0], contiguous a_lines)."""
    import pandas as pd

    from ab_line_classifier_tpu.predict.predict import group_clip_probs

    frames_df = pd.DataFrame({"Frame Path": ["vidA_0.jpg", "vidA_1.jpg",
                                             "vidB_0.jpg"]})
    probs = np.full((3, 2), 0.5, np.float32)
    padded, mask = group_clip_probs(frames_df, probs, ["vidA", "vidB"])
    assert mask.sum() == 3
    with pytest.raises(ValueError, match="vidC"):
        group_clip_probs(frames_df, probs, ["vidA", "vidC"])
