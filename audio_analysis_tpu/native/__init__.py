"""Native (C++) host ops, compiled on demand and loaded via ctypes.

The framework's compute path is XLA/Pallas; these are the host-side native
pieces where the reference leaned on external C++ (OpenCV's connected
components, reference: src/identify_tracks.py:686). Compilation is a single
``g++ -O3 -shared`` invocation cached next to the source; if no toolchain is
present the callers fall back to numpy implementations.
"""

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_CCL_LIB = None
_CCL_TRIED = False


def _build(src: Path, out: Path) -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(src),
        "-o",
        str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        logging.warning("native build failed for %s; using numpy fallback", src.name, exc_info=True)
        return False


class _CclLib:
    def __init__(self, dll):
        self._fn = dll.ccl_stats
        self._fn.restype = ctypes.c_int64
        self._fn.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.uint8, ndim=2, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(dtype=np.int64, ndim=2, flags="C_CONTIGUOUS"),
        ]
        self._fn_packed = dll.ccl_stats_packed
        self._fn_packed.restype = ctypes.c_int64
        self._fn_packed.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.uint8, ndim=2, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(dtype=np.int64, ndim=2, flags="C_CONTIGUOUS"),
        ]

    def ccl_stats(self, mask, h, w, out):
        return self._fn(mask, h, w, out)

    def ccl_stats_packed(self, packed, h, w, w_bytes, out):
        return self._fn_packed(packed, h, w, w_bytes, out)


def load_ccl_library():
    """Return the compiled CCL library wrapper, or None if unavailable."""
    global _CCL_LIB, _CCL_TRIED
    if _CCL_TRIED:
        return _CCL_LIB
    with _LOCK:
        if _CCL_TRIED:
            return _CCL_LIB
        src = _HERE / "ccl.cpp"
        so = _HERE / "_ccl.so"
        ok = so.exists() and so.stat().st_mtime >= src.stat().st_mtime
        if not ok:
            ok = _build(src, so)
        if ok:
            try:
                _CCL_LIB = _CclLib(ctypes.CDLL(str(so)))
            except Exception:
                logging.warning("could not load native CCL library", exc_info=True)
                _CCL_LIB = None
        _CCL_TRIED = True
        return _CCL_LIB
