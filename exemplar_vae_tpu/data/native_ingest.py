"""ctypes bindings for the native ingest library (native/ingest.cc).

Compiles lazily with g++ on first use (the image has no pybind11; C ABI +
ctypes per environment constraints). Falls back to numpy parsing when the
toolchain or library is unavailable — all loaders keep working either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "ingest.cc")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "libingest.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.amat_parse.restype = ctypes.c_long
            lib.amat_parse.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_long]
            lib.idx_parse.restype = ctypes.c_long
            lib.idx_parse.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_long),
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_long]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def load_amat(path: str, n_cols: int = 784) -> np.ndarray:
    """Parse a Larochelle .amat file -> float32 (rows, n_cols)."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path, dtype=np.float32).reshape(-1, n_cols)
    size = os.path.getsize(path)
    max_elems = size // 2 + 16  # every value is >= 2 bytes ("0 ")
    out = np.empty(max_elems, np.float32)
    n = lib.amat_parse(path.encode(),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       max_elems)
    if n < 0 or n % n_cols != 0:
        return np.loadtxt(path, dtype=np.float32).reshape(-1, n_cols)
    return out[:n].reshape(-1, n_cols).copy()


def load_idx(path: str) -> np.ndarray:
    """Parse an uncompressed IDX (MNIST-ubyte) file -> uint8 ndarray."""
    lib = _load()
    if lib is None or path.endswith(".gz"):
        return None  # caller falls back to the python parser
    ndim = ctypes.c_int()
    dims = (ctypes.c_long * 4)()
    total = lib.idx_parse(path.encode(), ctypes.byref(ndim), dims, None, 0)
    if total < 0:
        return None
    out = np.empty(total, np.uint8)
    got = lib.idx_parse(path.encode(), ctypes.byref(ndim), dims,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        total)
    if got != total:
        return None
    return out.reshape(tuple(dims[i] for i in range(ndim.value)))
