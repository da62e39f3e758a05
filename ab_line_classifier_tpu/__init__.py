"""ab_line_classifier_tpu — a TPU-native (JAX/Flax/XLA/Pallas) lung-ultrasound
A-line vs B-line classification framework.

This is a from-scratch, TPU-first rebuild with the capabilities of the
reference TensorFlow/Keras project (gchetty/ab-line-classifier): the same
config.yml-driven public API (reference ``config.yml:1-197``), the same model
zoo semantics (reference ``src/models/models.py``), the same experiment types
(``single_train`` / ``cross_validation`` / ``hparam_search``, reference
``src/train.py:343-371``), and the same prediction / metrics / results-file
contracts (reference ``src/predict.py``), re-designed for TPU hardware:

* all compute paths are jit-compiled XLA programs (no eager hot loops),
* the image preprocessing hot path is a fused Pallas kernel,
* clip-level inference is one batched device sweep with on-device aggregation,
* Grad-CAM is a single fused forward+gradient compiled pass,
* data-parallel training and fold/trial parallelism run over a
  ``jax.sharding.Mesh`` (ICI collectives inserted by XLA).
"""

__version__ = "0.1.0"

import os as _os

def _toolchain_fingerprint():  # pragma: no cover - environment dependent
    """Short hash identifying the compile toolchain: jax/jaxlib/libtpu
    versions plus host CPU features.

    Used to segregate the persistent XLA cache per toolchain so a libtpu
    roll (stale AOT executables -> FAILED_PRECONDITION version mismatch) or
    a host swap (CPU-feature mismatch -> SIGILL-risk cpu_aot_loader
    warnings) can never poison runs with entries from a different build.
    """
    import hashlib

    parts = []
    try:
        import importlib.metadata as _md
        for pkg in ("jax", "jaxlib", "libtpu", "libtpu-nightly"):
            try:
                parts.append(f"{pkg}={_md.version(pkg)}")
            except Exception:
                pass
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            got = set()
            for line in f:
                # model name matters beyond the flag set: XLA picks LLVM
                # tuning pseudo-features (e.g. prefer-no-scatter) per
                # detected microarchitecture, and the AOT loader warns of
                # SIGILL risk when they differ. Flags are sorted — kernels
                # disagree on ordering.
                key = line.split(":")[0].strip()
                if key in ("flags", "model name") and key not in got:
                    got.add(key)
                    val = line.split(":", 1)[1]
                    parts.append(f"{key}=" + " ".join(sorted(val.split())))
                if len(got) == 2:
                    break
    except Exception:
        import platform as _pf
        parts.append(_pf.machine())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


# Persistent XLA compilation cache: first compiles on this TPU backend go
# through a remote compiler and are slow; the cache makes every subsequent
# process start fast. Env vars win if already set. The cache dir is keyed by
# a toolchain fingerprint (see above) so stale AOT entries from a different
# libtpu/host build are never loaded.
# Backend override for CI / CPU-only machines FIRST, in its own guard: the
# container's sitecustomize force-registers the TPU platform and clobbers
# JAX_PLATFORMS, so an explicit config.update (which wins) is the only
# reliable switch; honored only if jax hasn't initialized a backend yet.
# Kept independent of the cache setup below — a cache-config failure must
# not silently disable the platform switch (tests/dryruns would dispatch
# to the real TPU, the exact failure the switch exists to prevent).
try:  # pragma: no cover - environment dependent
    _plat = _os.environ.get("ABLC_PLATFORM")
    # "tpu"/"auto" mean "the accelerator, whatever it registers as":
    # under the axon tunnel the TPU platform is literally named "axon",
    # so forcing jax_platforms="tpu" would fail init ("No jellyfish
    # device found") on the very host that HAS a chip. Auto-pick selects
    # the highest-priority registered backend (the accelerator when one
    # exists) on both real-TPU and tunneled hosts.
    if _plat and _plat.lower() not in ("tpu", "auto", "default"):
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
except Exception:
    pass

try:  # pragma: no cover - environment dependent
    import jax as _jax

    # Only fingerprint when the env var doesn't already pick the dir —
    # os.environ.get would evaluate the default eagerly, reading
    # /proc/cpuinfo + package metadata on every import for nothing.
    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if _cache_dir is None:
        _cache_dir = _os.path.join(
            _os.path.expanduser("~/.cache/ablc_jax_cache"),
            _toolchain_fingerprint())
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(_os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                              0.5)))
except Exception:
    pass

from ab_line_classifier_tpu.config import load_config, Config  # noqa: F401
