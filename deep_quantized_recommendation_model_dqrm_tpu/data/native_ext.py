"""ctypes bindings for the native C++ Criteo parser (native/criteo_preprocess
.cpp) — the framework's host-side native component, replacing the reference's
Cython-compiled data_utils (cython/cython_compile.py:14-26).

The shared library is built on first use with g++ -O3 (no pybind11 in this
environment; plain C ABI + ctypes). Falls back cleanly if no compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "criteo_preprocess.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libcriteo_preprocess.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.criteo_parse_buffer.restype = ctypes.c_int64
        lib.criteo_parse_buffer.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.criteo_parse_file.restype = ctypes.c_int64
        lib.criteo_parse_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.criteo_dicts_new.restype = ctypes.c_void_p
        lib.criteo_dicts_new.argtypes = [ctypes.c_int32]
        lib.criteo_dicts_free.argtypes = [ctypes.c_void_p]
        lib.criteo_dicts_map.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.criteo_dicts_size.restype = ctypes.c_int64
        lib.criteo_dicts_size.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.criteo_dicts_items.restype = ctypes.c_int64
        lib.criteo_dicts_items.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_buffer(chunk: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a raw text chunk (complete lines) -> (y, X_int, raw X_cat).

    The streaming-preprocessor fast path: no per-line Python objects at all —
    the chunk goes straight to the C parser.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    n_max = chunk.count(b"\n")
    if not chunk.endswith(b"\n"):
        n_max += 1
    y = np.zeros(n_max, np.int32)
    xi = np.zeros((n_max, 13), np.int32)
    xc = np.zeros((n_max, 26), np.int64)
    got = lib.criteo_parse_buffer(
        chunk,
        len(chunk),
        n_max,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return y[:got], xi[:got], xc[:got]


def parse_lines(lines: List[bytes]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse raw TSV lines -> (y[n] int32, X_int[n,13] int32, X_cat[n,26]
    int64 raw hex values)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    buf = b"".join(l if l.endswith(b"\n") else l + b"\n" for l in lines)
    n = len(lines)
    y = np.zeros(n, np.int32)
    xi = np.zeros((n, 13), np.int32)
    xc = np.zeros((n, 26), np.int64)
    got = lib.criteo_parse_buffer(
        buf,
        len(buf),
        n,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    assert got == n, f"parsed {got} of {n} lines"
    return y, xi, xc


def parse_file(
    path: str, max_rows: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse up to max_rows of a raw Criteo file at C speed."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    y = np.zeros(max_rows, np.int32)
    xi = np.zeros((max_rows, 13), np.int32)
    xc = np.zeros((max_rows, 26), np.int64)
    got = lib.criteo_parse_file(
        path.encode(),
        max_rows,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if got < 0:
        raise IOError(f"native parser failed to read {path}")
    return y[:got], xi[:got], xc[:got]


class NativeCatDicts:
    """C++ first-appearance categorical dictionaries (int64 raw -> int32 id).

    Replaces the per-row Python dict build — the reference's Terabyte
    preprocessing bottleneck (data_utils.py:967-1080) — with open-addressing
    hash maps in native code (~20-40x faster).
    """

    def __init__(self, ncols: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native parser unavailable")
        self._lib = lib
        self.ncols = ncols
        self._h = lib.criteo_dicts_new(ncols)

    def map(self, raw: np.ndarray) -> np.ndarray:
        """raw [n, ncols] int64 -> ids [n, ncols] int32 (inserting new keys)."""
        raw = np.ascontiguousarray(raw, np.int64)
        n = raw.shape[0]
        out = np.empty((n, self.ncols), np.int32)
        self._lib.criteo_dicts_map(
            self._h,
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            self.ncols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out

    def sizes(self) -> np.ndarray:
        return np.array(
            [self._lib.criteo_dicts_size(self._h, j) for j in range(self.ncols)],
            np.int64,
        )

    def items(self, col: int):
        n = int(self._lib.criteo_dicts_size(self._h, col))
        keys = np.empty(n, np.int64)
        ids = np.empty(n, np.int32)
        got = self._lib.criteo_dicts_items(
            self._h,
            col,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
        )
        return keys[:got], ids[:got]

    def __del__(self):
        try:
            self._lib.criteo_dicts_free(self._h)
        except Exception:
            pass
