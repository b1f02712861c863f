"""Host-side marching cubes via the native C++ extension (csrc/
marching_cubes.cpp), built lazily with g++ and loaded through ctypes —
the TPU-native equivalent of the reference's PyMCubes dependency
(implicit_surface.py:5,353).  The SDF grid is computed on TPU; extraction
runs on host CPU.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _build_lib():
    src_dir = os.path.join(os.path.dirname(__file__), "..", "csrc")
    src = os.path.join(src_dir, "marching_cubes.cpp")
    out = os.path.join(src_dir, "libmarching_cubes.so")
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
        lib.mc_run.restype = ctypes.c_int
        lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mc_free.restype = None
        lib.mc_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def marching_cubes(grid, iso=0.0):
    """grid: (nx, ny, nz) float array.  Returns (vertices (v, 3) float32 in
    grid-index coordinates, triangles (t, 3) int64)."""
    lib = _get_lib()
    g = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = g.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mc_run(g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    nx, ny, nz, ctypes.c_float(iso),
                    ctypes.byref(verts_p), ctypes.byref(tris_p),
                    ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise MemoryError("marching cubes allocation failed")
    try:
        v = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        t = np.ctypeslib.as_array(tris_p, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int64)
    finally:
        lib.mc_free(verts_p)
        lib.mc_free(tris_p)
    return v, t
