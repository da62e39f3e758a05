"""Test environment: CPU backend with a virtual 8-device mesh.

Must run before anything imports jax — pytest loads conftest first. This is
the standard JAX pattern for testing multi-device sharding without TPUs
(``xla_force_host_platform_device_count``); real-TPU behavior is exercised by
``bench.py`` and the driver's compile checks instead.
"""

import os

# The container's sitecustomize force-registers the TPU platform and
# overrides JAX_PLATFORMS; the package honors ABLC_PLATFORM via an
# authoritative config.update (ab_line_classifier_tpu/__init__.py).
os.environ.setdefault("ABLC_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: the 1-CPU host is compile-bound; caching
# makes repeated test runs fast. The dir comes from the package default,
# which keys by toolchain fingerprint so entries from another jax/jaxlib/
# host build are never loaded. (NOTE: this jaxlib's CPU AOT loader logs
# cosmetic `cpu_aot_loader.cc` feature-mismatch errors on every cache HIT —
# the "+prefer-no-scatter/gather" pseudo-features it compiles with never
# appear in LLVM host detection. Benign: entries load and run correctly.)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
# Golden-parity tests compare against real TF/Keras; oneDNN chooses
# computation order (and thus float rounding) per run, so the *golden*
# side itself is nondeterministic with it enabled — multi-step training
# parity then flakes on different assertions each run. Must be set
# before `import tensorflow` anywhere; conftest runs first.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# cv2 must be imported BEFORE jax in this environment (OpenMP/XLA runtime
# clash deadlocks if the order is reversed).
try:
    import cv2  # noqa: F401
except ImportError:
    pass

import ab_line_classifier_tpu  # noqa: F401,E402  (platform + cache setup)
import jax  # noqa: E402

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend())


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def derive_workspace_config(ws, fcsv, ccsv, fdir):
    """The standard derived config dict for a synthetic-dataset workspace:
    every PATHS output redirected under ``ws``, local tracker, 32x32
    images. Model/experiment tweaks stay at the call site. One definition
    so a config-schema rename is fixed here, not in every e2e module."""
    from ab_line_classifier_tpu.config import load_config

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["PATHS"].update({
        "FRAME_TABLE": fcsv, "CLIPS_TABLE": ccsv, "FRAMES": fdir,
        "PARTITIONS": ws + "/partitions/",
        "MODEL_WEIGHTS": ws + "/results/models/",
        "MODEL_TO_LOAD": ws + "/results/models/latest",
        "METRICS": ws + "/results/metrics/",
        "BATCH_PREDS": ws + "/results/predictions/",
        "EXPERIMENTS": ws + "/results/experiments/",
        "LOGS": ws + "/results/logs/",
        "IMAGES": ws + "/results/figures/",
        "HEATMAPS": ws + "/img/heatmaps",
        "EXPERIMENT_VISUALIZATIONS": ws + "/img/experiments/",
        "CLASS_NAME_MAP": ws + "/class_map.json",
    })
    d["TRACKER"]["DIR"] = ws + "/results/runs/"
    # Workspace-local artifact store: resolve_datasets consults it
    # (resolution step 3), so a shared repo-root store would let
    # tests cross-contaminate.
    d["TRACKER"]["ARTIFACTS_DIR"] = ws + "/results/artifacts/"
    d["DATA"]["IMG_DIM"] = [32, 32]
    return d


def randomize_leaves(variables, seed=0):
    """EVERY leaf randomized before an export/import round trip.

    Fresh inits carry zero biases and constant BN stats on BOTH sides of a
    round trip, so an importer that silently skips those leaves compares
    0 == 0 and passes bit-exactly — the bug class of commit 2f1c997
    (ONNX-restored models served with zero biases). Variance-like leaves
    stay positive so forward passes through the randomized tree remain
    finite (see CLAUDE.md conventions)."""
    import numpy as np

    rng = np.random.RandomState(seed)

    def rand(path, a):
        arr = rng.normal(0.1, 0.5, np.shape(a))
        if any("var" in str(getattr(p, "key", "")).lower() for p in path):
            arr = np.abs(arr) + 0.05
        return np.asarray(arr, np.asarray(a).dtype)

    return jax.tree_util.tree_map_with_path(rand, variables)


def cli_env(cfg_path=None, extra=None):
    """Subprocess env for driving the CLIs: CPU backend, optional workspace
    config, and the repo PREPENDED to PYTHONPATH. One definition —
    overwriting PYTHONPATH instead of prepending drops the TPU-plugin path
    (/root/.axon_site) per CLAUDE.md, and the recipe must not fork per
    test module."""
    env = dict(os.environ)
    env.update({
        "ABLC_PLATFORM": "cpu",
        "PYTHONPATH": REPO_ROOT + os.pathsep + env.get("PYTHONPATH", ""),
    })
    if cfg_path is not None:
        env["ABLC_CONFIG"] = cfg_path
    if extra:
        env.update(extra)
    return env
