"""ctypes wrapper over the native BVH raycaster (csrc/raycast_bvh.cpp) —
pyembree-equivalent first-hit queries for mesh cleaning."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _build_lib():
    src_dir = os.path.join(os.path.dirname(__file__), "..", "csrc")
    src = os.path.join(src_dir, "raycast_bvh.cpp")
    out = os.path.join(src_dir, "libraycast_bvh.so")
    if (not os.path.exists(out)) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", out],
            check=True, capture_output=True)
    return out


def _get_lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.bvh_first_hit.restype = None
        lib.bvh_first_hit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float)]
        lib.bvh_free.restype = None
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


class RayMeshIntersector:
    """First-hit intersector (trimesh.ray.ray_pyembree-compatible subset)."""

    def __init__(self, mesh):
        self._lib = _get_lib()
        self._verts = np.ascontiguousarray(mesh.vertices, dtype=np.float32)
        self._tris = np.ascontiguousarray(mesh.faces, dtype=np.int64)
        self._handle = self._lib.bvh_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self._tris))

    def intersects_first(self, origins, directions):
        """Returns (tri_idx (n,) int64, -1 on miss; t (n,) float32)."""
        o = np.ascontiguousarray(origins, dtype=np.float32)
        d = np.ascontiguousarray(directions, dtype=np.float32)
        n = len(o)
        tri = np.empty(n, np.int64)
        t = np.empty(n, np.float32)
        self._lib.bvh_first_hit(
            self._handle,
            o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return tri, t

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bvh_free(self._handle)
            self._handle = None
