"""ctypes binding for the native batch JPEG loader (csrc/loader.cc).

Builds the shared library on first use (g++ + libjpeg, both baked into the
image) and caches it next to the source. Every entry point degrades
gracefully: if the toolchain or libjpeg is missing, callers fall back to the
PIL decode path in ``data.pipeline``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC_DIR, "libablcloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

RESIZE_MODE = {"tf": 0, "cv2": 1}


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC_DIR, "libablcloader.so"],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if
    unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_CSRC_DIR, "loader.cc")
        stale = (os.path.isfile(_LIB_PATH) and os.path.isfile(src)
                 and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
        # A .so older than loader.cc must rebuild: loading it would run
        # stale code that the ABI version check cannot catch (same
        # version, different behavior) — parity tests would then pass
        # against the wrong binary.
        if (not os.path.isfile(_LIB_PATH) or stale) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ablc_decode_jpeg_batch.restype = ctypes.c_int
            lib.ablc_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.ablc_loader_version.restype = ctypes.c_int
            if lib.ablc_loader_version() != 1:
                raise RuntimeError("loader ABI mismatch")
            _lib = lib
            return _lib
        except Exception:
            _build_failed = True
            return None


def native_available() -> bool:
    return load_library() is not None


def decode_jpeg_batch(paths: Sequence[str], out_hw: Tuple[int, int],
                      resize_mode: str = "tf",
                      n_threads: int = 0,
                      out: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode + nearest-resize a batch of JPEGs into uint8 [N, H, W, 3].

    Raises ``RuntimeError`` listing failed files (corrupt/missing), matching
    the Python path's fail-loud behavior.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    h, w = out_hw
    if out is None:
        out = np.empty((n, h, w, 3), np.uint8)
    # Hard check, not assert: the C loader writes n*h*w*3 raw bytes through
    # out.ctypes.data — under `python -O` a stripped assert would turn a
    # wrong layout into silent memory corruption.
    if not (out.flags["C_CONTIGUOUS"] and out.dtype == np.uint8
            and out.shape == (n, h, w, 3)):
        raise ValueError(
            f"out must be C-contiguous uint8 [{n},{h},{w},3]; got "
            f"{out.dtype} {out.shape} contiguous={out.flags['C_CONTIGUOUS']}")
    codes = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.ablc_decode_jpeg_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, RESIZE_MODE[resize_mode],
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    if failures:
        bad = [paths[i] for i in np.nonzero(codes)[0][:5]]
        raise RuntimeError(
            f"native loader failed on {failures}/{n} files, e.g. {bad}")
    return out
