"""ctypes bindings for the native host-side data ops (src/host_ops.cpp).

The shared library is built on first use with g++ (no pip deps); callers
must handle ``available() == False`` and fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "src" / "host_ops.cpp"
_LIB = _DIR / "libmggan_host.so"
_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.parse_numeric_txt.restype = ctypes.c_int64
        lib.parse_numeric_txt.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.extract_patches.restype = None
        lib.extract_patches.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.window_presence.restype = ctypes.c_int64
        lib.window_presence.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def parse_numeric_txt(path, n_cols_hint=8):
    """Parse a numeric text file -> 1D float64 array, or None if the file
    contains non-numeric tokens (caller falls back to pandas)."""
    lib = load()
    if lib is None:
        return None
    size = Path(path).stat().st_size
    # worst case one value per 2 bytes
    max_vals = max(size // 2 + 16, 64)
    out = np.empty(max_vals, np.float64)
    n = lib.parse_numeric_txt(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_vals,
    )
    if n < 0:
        return None
    return out[:n]


def extract_patches(img: np.ndarray, centers: np.ndarray, margin: int):
    """(H,W,3) uint8 + (n,2) int centres -> (n, side, side, 3) uint8."""
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    cx = np.ascontiguousarray(centers[:, 0], np.int64)
    cy = np.ascontiguousarray(centers[:, 1], np.int64)
    n = len(centers)
    side = 2 * margin + 1
    out = np.empty((n, side, side, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.extract_patches(
        img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
        cx.ctypes.data_as(i64p), cy.ctypes.data_as(i64p), n, margin,
        out.ctypes.data_as(u8p),
    )
    return out


def window_presence(present: np.ndarray, seq_len: int, skip: int = 1):
    """(P, F) uint8 presence -> (num_windows, P) uint8 keep matrix."""
    lib = load()
    assert lib is not None
    present = np.ascontiguousarray(present, np.uint8)
    p, f = present.shape
    nw = (f - seq_len) // skip + 1 if f >= seq_len else 0
    keep = np.zeros((max(nw, 0), p), np.uint8)
    if nw > 0:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.window_presence(
            present.ctypes.data_as(u8p), p, f, seq_len, skip,
            keep.ctypes.data_as(u8p),
        )
    return keep
