"""Native (C++) host runtime components, built on demand with g++.

The TPU compute path is pure JAX/XLA/Pallas; these helpers cover the
host-side corners where exactness or latency demands native code — today
that is connectivity enforcement on host arrays
(:func:`enforce_connectivity_native`), which among other things reproduces
libstdc++'s std::partial_sort tie behavior exactly (see ops/cca.py for why
the on-device path can deviate on boundary-area ties).

The shared object is compiled once into ``~/.cache/fast_slic_tpu`` (or
``$FSTPU_NATIVE_CACHE``) and loaded via ctypes; if no compiler is available
the package degrades gracefully (``available()`` -> False) and callers fall
back to the device/python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "cca_native.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _cache_dir() -> str:
    d = os.environ.get("FSTPU_NATIVE_CACHE")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache", "fast_slic_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"fstpu_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + ".tmp"
    cmd = ["g++", "-O2", "-std=c++14", "-shared", "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(tmp, so_path)
    return so_path


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fstpu_enforce_connectivity.restype = ctypes.c_int
        lib.fstpu_enforce_connectivity.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.fstpu_knn.restype = ctypes.c_int
        lib.fstpu_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def enforce_connectivity_native(labels: np.ndarray, K: int,
                                thres: int) -> np.ndarray:
    """Exact host CCA (reference semantics incl. partial_sort ties).

    labels: integer [H, W]; values cast to uint16 (0xFFFF = unassigned).
    Returns a new uint16 array.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native module unavailable (no g++?)")
    buf = np.ascontiguousarray(labels.astype(np.uint16))
    H, W = buf.shape
    lib.fstpu_enforce_connectivity(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        H, W, int(K), int(thres))
    return buf


def knn_native(ys: np.ndarray, xs: np.ndarray, H: int, W: int,
               num_neighbors: int):
    """Grid-bucketed KNN with the reference's heap semantics (see
    ops/graph.py docstring).  Returns list-of-lists in heap-layout order."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native module unavailable (no g++?)")
    ys = np.ascontiguousarray(ys, np.float32)
    xs = np.ascontiguousarray(xs, np.float32)
    K = ys.shape[0]
    out = np.full((K, num_neighbors), -1, np.int32)
    counts = np.zeros(K, np.int32)
    lib.fstpu_knn(
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        K, int(H), int(W), int(num_neighbors),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return [out[k, :counts[k]].tolist() for k in range(K)]
