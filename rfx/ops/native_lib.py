"""ctypes binding for the native C++ BVH builder (native/bvh_builder.cpp).

No pybind11 in this image, so the boundary is a C ABI loaded with ctypes.
The library is compiled on first use if the shared object is missing (g++ is
in the toolchain); failures degrade gracefully to the NumPy builder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["native_available", "build_bvh_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
# Versioned filename: the C ABI gained a split_mode arg in round 5; a stale
# binary from an earlier checkout must never be loaded.
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librfx_bvh_v2.so"))
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        src = os.path.abspath(os.path.join(_NATIVE_DIR, "bvh_builder.cpp"))
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO_PATH, src],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.rfx_bvh_build.restype = ctypes.c_void_p
    lib.rfx_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rfx_bvh_n_nodes.restype = ctypes.c_int
    lib.rfx_bvh_n_nodes.argtypes = [ctypes.c_void_p]
    lib.rfx_bvh_n_padded.restype = ctypes.c_longlong
    lib.rfx_bvh_n_padded.argtypes = [ctypes.c_void_p]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rfx_bvh_fill.restype = None
    lib.rfx_bvh_fill.argtypes = [ctypes.c_void_p, f32p, f32p, i32p, i32p, i32p,
                                 f32p, f32p, f32p, i32p]
    lib.rfx_bvh_free.restype = None
    lib.rfx_bvh_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(mesh, leaf_size: int, split: str = "sah"):
    """TriangleMesh -> FlatBVH via the C++ builder (same layout contract and
    split heuristics — binned SAH / centroid median — as rfx.bvh.build_bvh's
    NumPy path)."""
    from rfx.bvh import FlatBVH

    lib = _load()
    if lib is None:
        raise RuntimeError("native BVH builder unavailable")
    tris = np.ascontiguousarray(mesh.triangles().reshape(-1, 9), dtype=np.float32)
    f = tris.shape[0]
    fp = tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    h = lib.rfx_bvh_build(fp, f, leaf_size, 1 if split == "sah" else 0)
    try:
        n_nodes = lib.rfx_bvh_n_nodes(h)
        p = lib.rfx_bvh_n_padded(h)
        aabb_min = np.empty((n_nodes, 3), np.float32)
        aabb_max = np.empty((n_nodes, 3), np.float32)
        tri_start = np.empty((n_nodes,), np.int32)
        tri_count = np.empty((n_nodes,), np.int32)
        skip = np.empty((n_nodes,), np.int32)
        tri_v0 = np.empty((p, 3), np.float32)
        tri_e1 = np.empty((p, 3), np.float32)
        tri_e2 = np.empty((p, 3), np.float32)
        tri_face = np.empty((p,), np.int32)

        def F(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        def I(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        lib.rfx_bvh_fill(h, F(aabb_min), F(aabb_max), I(tri_start), I(tri_count),
                         I(skip), F(tri_v0), F(tri_e1), F(tri_e2), I(tri_face))
    finally:
        lib.rfx_bvh_free(h)
    return FlatBVH(
        aabb_min=aabb_min, aabb_max=aabb_max, tri_start=tri_start,
        tri_count=tri_count, skip=skip, tri_v0=tri_v0, tri_e1=tri_e1,
        tri_e2=tri_e2, tri_face=tri_face, leaf_size=leaf_size,
    )
