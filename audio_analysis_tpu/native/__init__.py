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

        self._fn_runs = getattr(dll, "ccl_stats_runs", None)
        if self._fn_runs is not None:
            self._fn_runs.restype = ctypes.c_int64
            self._fn_runs.argtypes = [
                np.ctypeslib.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                np.ctypeslib.ndpointer(dtype=np.int64, ndim=2, flags="C_CONTIGUOUS"),
            ]

    def ccl_stats(self, mask, h, w, out):
        return self._fn(mask, h, w, out)

    def ccl_stats_packed(self, packed, h, w, w_bytes, out):
        return self._fn_packed(packed, h, w, w_bytes, out)

    def ccl_stats_runs(self, starts, ends, n_runs, h, w, out):
        return self._fn_runs(starts, ends, n_runs, h, w, out)


def load_ccl_library():
    """Return the compiled CCL library wrapper, or None if unavailable.

    The .so is never shipped (it's built with -march=native, so a foreign
    binary could SIGILL); a source-hash stamp next to it decides whether the
    local build is current — mtimes are untrustworthy after a fresh checkout.
    """
    global _CCL_LIB, _CCL_TRIED
    if _CCL_TRIED:
        return _CCL_LIB
    with _LOCK:
        if _CCL_TRIED:
            return _CCL_LIB
        src = _HERE / "ccl.cpp"
        so = _HERE / "_ccl.so"
        stamp = _HERE / "_ccl.so.sha"
        if not src.exists():
            logging.warning("native CCL source missing; using numpy fallback")
            _CCL_TRIED = True
            return None
        import hashlib

        src_hash = hashlib.sha256(src.read_bytes()).hexdigest()
        ok = (
            so.exists()
            and stamp.exists()
            and stamp.read_text().strip() == src_hash
        )
        if not ok:
            ok = _build(src, so)
            if ok:
                try:
                    stamp.write_text(src_hash)
                except OSError:
                    pass
        if ok:
            try:
                _CCL_LIB = _CclLib(ctypes.CDLL(str(so)))
            except Exception:
                logging.warning("could not load native CCL library", exc_info=True)
                _CCL_LIB = None
        _CCL_TRIED = True
        return _CCL_LIB


# -- generic on-demand builder (hash-stamped, like the CCL path) -------------

_LIBS = {}


def _load_so(stem: str):
    """Build (if stale) and dlopen native/<stem>.cpp -> _<stem>.so; returns
    a ctypes.CDLL or None. Cached per process."""
    if stem in _LIBS:
        return _LIBS[stem]
    with _LOCK:
        if stem in _LIBS:
            return _LIBS[stem]
        src = _HERE / f"{stem}.cpp"
        so = _HERE / f"_{stem}.so"
        stamp = _HERE / f"_{stem}.so.sha"
        lib = None
        if src.exists():
            import hashlib

            src_hash = hashlib.sha256(src.read_bytes()).hexdigest()
            ok = so.exists() and stamp.exists() and stamp.read_text().strip() == src_hash
            if not ok:
                ok = _build(src, so)
                if ok:
                    try:
                        stamp.write_text(src_hash)
                    except OSError:
                        pass
            if ok:
                try:
                    lib = ctypes.CDLL(str(so))
                except Exception:
                    logging.warning("could not load native %s library", stem, exc_info=True)
        else:
            logging.warning("native %s source missing; using numpy fallback", stem)
        _LIBS[stem] = lib
        return lib


class _PcmCodecLib:
    """ctypes wrapper for pcmcodec.cpp (PCM wire-codec host encoder)."""

    def __init__(self, dll):
        self.widths = dll.pcm_widths
        self.widths.restype = ctypes.c_int64
        self.widths.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.int16, ndim=2, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(dtype=np.uint8, ndim=2, flags="C_CONTIGUOUS"),
        ]
        self.pack = dll.pcm_pack
        self.pack.restype = ctypes.c_int64
        self.pack.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.int16, ndim=2, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(dtype=np.uint8, ndim=1, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int64, ndim=1, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint32, ndim=1, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint32, ndim=1, flags="C_CONTIGUOUS"),
        ]
        self.pfor = dll.pcm_pfor
        self.pfor.restype = ctypes.c_int64
        self.pfor.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.int16, ndim=2, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(dtype=np.uint8, ndim=1, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS"),
        ]


def load_pcmcodec_library():
    """The native PCM wire-codec encoder, or None (numpy fallback)."""
    dll = _load_so("pcmcodec")
    return _PcmCodecLib(dll) if dll is not None else None
