"""ctypes bridge to the C++ geometry core (csrc/bhxcore.cpp).

The native library provides the perf-critical host-side preprocessing the
reference implements in Rust: BVH construction (triangle.rs:143-259) and
OBJ parsing (model.rs:7-87).  It is compiled on demand with g++ (no pip
installs available); if compilation fails the numpy fallbacks in
bhx.geometry.bvh / bhx.geometry.obj are used — both paths are tested for
identical output.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO_PATH = os.path.join(_CSRC, "libbhxcore.so")
_SRC_PATH = os.path.join(_CSRC, "bhxcore.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", _SRC_PATH, "-o", _SO_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC_PATH):
            return None
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        lib.bhx_build_bvh.restype = ctypes.c_int64
        lib.bhx_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # points (P*3)
            ctypes.c_int64,  # P
            ctypes.POINTER(ctypes.c_int32),  # tris (T*3)
            ctypes.c_int64,  # T
            ctypes.c_int32,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # out node_min (2T*3)
            ctypes.POINTER(ctypes.c_float),  # out node_max
            ctypes.POINTER(ctypes.c_int32),  # out node_left (2T)
            ctypes.POINTER(ctypes.c_int32),  # out node_count
            ctypes.POINTER(ctypes.c_int32),  # out lookup (T)
        ]
        lib.bhx_obj_parse.restype = ctypes.c_int64
        lib.bhx_obj_parse.argtypes = [ctypes.c_char_p]
        lib.bhx_obj_counts.restype = None
        lib.bhx_obj_counts.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bhx_obj_fill.restype = None
        lib.bhx_obj_fill.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),  # points (P*3)
            ctypes.POINTER(ctypes.c_float),  # normals (Nn*3)
            ctypes.POINTER(ctypes.c_int32),  # tri_p (T*3)
            ctypes.POINTER(ctypes.c_int32),  # tri_n (T*3)
            ctypes.POINTER(ctypes.c_uint8),  # has_n (T,)
        ]
        lib.bhx_obj_free.restype = None
        lib.bhx_obj_free.argtypes = [ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh(points: np.ndarray, tri_points: np.ndarray, leaf_size: int = 2):
    from bhx.geometry.bvh import BvhArrays

    lib = _load()
    assert lib is not None
    points = np.ascontiguousarray(points, np.float32)
    tris = np.ascontiguousarray(tri_points, np.int32)
    ntris = tris.shape[0]
    max_nodes = max(2 * ntris, 1)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_left = np.zeros(max_nodes, np.int32)
    node_count = np.zeros(max_nodes, np.int32)
    lookup = np.empty(ntris, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    used = lib.bhx_build_bvh(
        ptr(points, ctypes.c_float),
        points.shape[0],
        ptr(tris, ctypes.c_int32),
        ntris,
        leaf_size,
        ptr(node_min, ctypes.c_float),
        ptr(node_max, ctypes.c_float),
        ptr(node_left, ctypes.c_int32),
        ptr(node_count, ctypes.c_int32),
        ptr(lookup, ctypes.c_int32),
    )
    used = int(used)
    return BvhArrays(
        node_min=node_min[:used].copy(),
        node_max=node_max[:used].copy(),
        node_left=node_left[:used].copy(),
        node_count=node_count[:used].copy(),
        lookup=lookup,
    )


def load_obj(path: str) -> Optional[tuple]:
    """Native OBJ parse (reference model.rs:7-87 via tobj).

    Returns the RAW parse — ``(points (P,3) f32, normals (Nn,3) f32,
    tri_p (T,3) i32, tri_n (T,3) i32, has_n (T,) bool)`` — before the
    scale/flip conventions and missing-normal synthesis, which the shared
    post-pass in bhx.geometry.obj applies identically for both parsers.
    Returns None when the native library is unavailable or the file can't
    be opened (callers fall back to the numpy parser).
    """
    lib = _load()
    if lib is None:
        return None
    handle = lib.bhx_obj_parse(os.fsencode(path))
    if handle < 0:
        return None
    try:
        counts = (ctypes.c_int64 * 3)()
        lib.bhx_obj_counts(handle, counts)
        p, nn, t = int(counts[0]), int(counts[1]), int(counts[2])
        points = np.empty((p, 3), np.float32)
        normals = np.empty((nn, 3), np.float32)
        tri_p = np.empty((t, 3), np.int32)
        tri_n = np.empty((t, 3), np.int32)
        has_n = np.empty((t,), np.uint8)

        def ptr(a, ty):
            return a.ctypes.data_as(ctypes.POINTER(ty))

        lib.bhx_obj_fill(
            handle,
            ptr(points, ctypes.c_float), ptr(normals, ctypes.c_float),
            ptr(tri_p, ctypes.c_int32), ptr(tri_n, ctypes.c_int32),
            ptr(has_n, ctypes.c_uint8),
        )
    finally:
        lib.bhx_obj_free(handle)
    return points, normals, tri_p, tri_n, has_n.astype(bool)
