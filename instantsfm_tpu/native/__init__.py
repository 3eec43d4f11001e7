"""Native C++ host-runtime kernels (built on first use, ctypes-loaded).

See ``src/native.cpp``.  If no C++ toolchain is available the callers fall
back to scipy/numpy implementations — the native path exists for large-scene
throughput of the host runtime (db/track assembly, color sampling), mirroring
where the reference leans on C/C++ (SURVEY.md §2 B3/B6/B10).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.uf_connected_components.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.uf_connected_components_i32.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p]
        lib.bilinear_sample_u8.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64p,
            ctypes.c_int64, f32p]
        lib.csr_offsets.argtypes = [i64p, ctypes.c_int64, i64p]
        _lib = lib
        return _lib


def connected_components(e1: np.ndarray, e2: np.ndarray,
                         n_nodes: int) -> np.ndarray:
    """Root label per node via native union-find; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if n_nodes < 2**31:     # int32 path: half the parent-array traffic
        e1 = np.ascontiguousarray(e1, np.int32)
        e2 = np.ascontiguousarray(e2, np.int32)
        labels = np.empty(n_nodes, np.int32)
        lib.uf_connected_components_i32(e1, e2, len(e1), n_nodes, labels)
        return labels
    e1 = np.ascontiguousarray(e1, np.int64)
    e2 = np.ascontiguousarray(e2, np.int64)
    labels = np.empty(n_nodes, np.int64)
    lib.uf_connected_components(e1, e2, len(e1), n_nodes, labels)
    return labels


def bilinear_sample(img: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """[N, C] float32 bilinear samples; out-of-bounds rows are -1."""
    lib = get_lib()
    if lib is None:
        return None
    if img.ndim == 2:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.uint8)
    xy = np.ascontiguousarray(xy, np.float64)
    out = np.empty((len(xy), img.shape[2]), np.float32)
    lib.bilinear_sample_u8(img, img.shape[0], img.shape[1], img.shape[2],
                           xy, len(xy), out)
    return out
