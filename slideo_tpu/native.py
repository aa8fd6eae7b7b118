"""ctypes bindings for the native C++ runtime components (csrc/).

The shared library is built on demand with g++ (no pip deps available);
every entry point degrades gracefully to a pure-Python/JAX path when the
toolchain or library is unavailable. The C++ source ships inside the
package so wheel installs can build it too.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent / "csrc" / "slideo_native.cpp"
_LIB_DIR = Path(__file__).resolve().parent / "_build"
_LIB = _LIB_DIR / "libslideo_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _LIB_DIR.mkdir(exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-pthread", str(_SRC), "-o", str(_LIB),
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.slideo_sha256_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.slideo_sha256_file.restype = ctypes.c_int
            lib.slideo_hamming_knn.argtypes = [
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.slideo_hamming_knn.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def sha256_file(path: str) -> str | None:
    """SHA-256 hex digest of a file via the native hasher; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(65)
    if lib.slideo_sha256_file(path.encode(), out) != 0:
        raise IOError(f"could not hash '{path}'")
    return out.value.decode()


def hamming_knn(
    query_bits: np.ndarray,
    index_bits: np.ndarray,
    k: int,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Exact packed-bit Hamming kNN (CPU reference backend).

    query_bits: [Q, W] uint64; index_bits: [N, W] uint64.
    Returns (dist [Q, k] int32, idx [Q, k] int32) or None if unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(query_bits, np.uint64)
    ix = np.ascontiguousarray(index_bits, np.uint64)
    nq, words = q.shape
    ni = ix.shape[0]
    dist = np.empty((nq, k), np.int32)
    idx = np.empty((nq, k), np.int32)
    lib.slideo_hamming_knn(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), nq,
        ix.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), ni,
        words, k,
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return dist, idx
