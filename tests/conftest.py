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
