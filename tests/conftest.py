"""Test environment: CPU backend with a virtual 8-device mesh.

Must run before anything imports jax — pytest loads conftest first. This is
the standard JAX pattern for testing multi-device sharding without TPUs
(``xla_force_host_platform_device_count``); real-TPU behavior is exercised by
``bench.py`` and the driver's compile checks instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: the 1-CPU host is compile-bound; caching makes
# repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

# cv2 must be imported BEFORE jax in this environment (OpenMP/XLA runtime
# clash deadlocks if the order is reversed).
try:
    import cv2  # noqa: F401
except ImportError:
    pass

# The container's sitecustomize force-registers the TPU platform and
# overrides JAX_PLATFORMS; config.update is the authoritative switch.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
