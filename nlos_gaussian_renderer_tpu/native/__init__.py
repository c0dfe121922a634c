"""ctypes loader for the native host runtime (csrc/nlos_native.cpp).

Compiles the shared library on first use with g++ (the image ships the
toolchain but not pybind11, so the C ABI + ctypes is the binding layer).
Every entry point has a NumPy fallback so the package works even without a
compiler — parity between the two is covered by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "nlos_native.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libnlos_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # compiler missing / failed: fall back to numpy
        print(f"[nlos native] build failed ({e}); using NumPy fallbacks",
              file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not os.path.exists(_SRC) and not os.path.exists(_LIB_PATH):
                return None
            if os.path.exists(_SRC) and not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"[nlos native] load failed ({e}); using NumPy fallbacks",
                  file=sys.stderr)
            return None
        lib.knn_mean_dist2.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.space_carving_votes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.detect_first_bounces.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ]
        for fn in (lib.knn_mean_dist2, lib.space_carving_votes,
                   lib.detect_first_bounces):
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def knn_mean_dist2(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors (simple-knn
    `distCUDA2` semantics with k=3)."""
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = points.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty(n, dtype=np.float32)
        rc = lib.knn_mean_dist2(_fptr(points), n, int(k), _fptr(out))
        if rc == 0:
            return out
    # NumPy fallback (O(n^2), chunked).
    out = np.empty(n, dtype=np.float32)
    kk = max(1, min(k, n - 1)) if n > 1 else 1
    chunk = max(1, 2_000_000 // max(n, 1))
    for i in range(0, n, chunk):
        d2 = ((points[i : i + chunk, None, :] - points[None, :, :]) ** 2).sum(-1)
        for r in range(d2.shape[0]):
            d2[r, i + r] = np.inf
        part = np.partition(d2, kk - 1, axis=1)[:, :kk]
        out[i : i + chunk] = part.mean(axis=1)
    if n <= 1:
        out[:] = 1e-6
    return out


def space_carving_votes(coords: np.ndarray, cams: np.ndarray,
                        radii: np.ndarray) -> np.ndarray:
    """votes[v] = #scan points whose first-bounce sphere excludes voxel v."""
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    cams = np.ascontiguousarray(cams, dtype=np.float32)
    radii = np.ascontiguousarray(radii, dtype=np.float32)
    lib = _load()
    if lib is not None:
        votes = np.empty(coords.shape[0], dtype=np.int32)
        rc = lib.space_carving_votes(
            _fptr(coords), coords.shape[0], _fptr(cams), _fptr(radii),
            cams.shape[0], votes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return votes
    valid = radii > 0
    votes = np.zeros(coords.shape[0], dtype=np.int32)
    for j in np.nonzero(valid)[0]:
        d2 = ((coords - cams[j][None, :]) ** 2).sum(-1)
        votes += (d2 >= radii[j] ** 2).astype(np.int32)
    return votes


def detect_first_bounces(transient: np.ndarray,
                         threshold: float = 1e-5) -> np.ndarray:
    """First-rise bin per scan pixel (see utils/carving.py for semantics)."""
    transient = np.ascontiguousarray(transient, dtype=np.float32)
    l, m, n = transient.shape
    lib = _load()
    if lib is not None:
        out = np.empty((m, n), dtype=np.float32)
        rc = lib.detect_first_bounces(
            _fptr(transient), l, m, n, float(threshold), _fptr(out)
        )
        if rc == 0:
            return out
    diff = np.diff(transient, axis=0) > threshold
    any_rise = diff.any(axis=0)
    first = diff.argmax(axis=0) + 1
    nonzero = transient.sum(axis=0) != 0
    return np.where(any_rise & nonzero, first, 0).astype(np.float32)
