"""ctypes wrapper for the native JPEG decode pool (jpeg_pool.cpp).

pybind11 is not available in this image, so the extension exposes a plain
C ABI and is driven via ctypes.  The shared object is compiled on first
use with g++ (cached next to the source; rebuilt when the source is newer)
and everything degrades gracefully to the cv2 path when a toolchain or
libjpeg is missing.

Why native: decoding JPEG frames is the host bottleneck feeding a chip at
>1250 clips/s.  The pool decodes on C++ threads with the GIL released for
the WHOLE batch (one ctypes call), and uses libjpeg's DCT-domain
prescaling (1/2, 1/4, 1/8) so large frames headed for a small canvas
never get fully IDCT'd — cv2.imread always decodes at full resolution.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_pool.cpp")
_SO = os.path.join(_DIR, "_jpeg_pool.so")

_lib = None
_lib_err: Optional[str] = None
_build_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    with _build_lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO,
                       "-ljpeg", "-lpthread"]
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.jp_pool_create.restype = ctypes.c_void_p
            lib.jp_pool_create.argtypes = [ctypes.c_int]
            lib.jp_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.jp_decode_batch.restype = ctypes.c_int
            lib.jp_decode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            _lib = lib
        except Exception as e:  # toolchain/libjpeg missing -> cv2 fallback
            _lib_err = f"{type(e).__name__}: {e}"
    return _lib


def native_jpeg_available() -> bool:
    return _load() is not None


class NativeJpegPool:
    """Persistent decode pool; one instance per loader process."""

    def __init__(self, n_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native jpeg pool unavailable: {_lib_err}")
        self._lib = lib
        n = n_threads or max(os.cpu_count() or 1, 1)
        self._pool = lib.jp_pool_create(int(n))

    def decode_batch(self, paths: List[str], out_h: int,
                     out_w: int) -> np.ndarray:
        """Decode ``paths`` -> (N, out_h, out_w, 3) uint8 RGB (bilinear).

        Failed decodes come back as zero frames (the count is checked and
        raised, matching the loud failure of cv2.imread returning None)."""
        n = len(paths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failed = self._lib.jp_decode_batch(
            self._pool, arr, n, int(out_h), int(out_w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if failed:
            raise IOError(f"native jpeg pool: {failed}/{n} decodes failed")
        return out

    def close(self):
        if self._pool:
            self._lib.jp_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # best-effort; explicit close preferred
        try:
            self.close()
        except Exception:
            pass
