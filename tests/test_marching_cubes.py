"""The native marching-cubes extension must reconstruct a sphere with the
right radius and a closed, consistent topology."""

import numpy as np

from surf_tpu.geometry.marching_cubes import marching_cubes


def test_sphere_extraction():
    n = 48
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    r = 0.6
    sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - r
    # reference extracts with -sdf and threshold 0 (implicit_surface.py:350-353)
    verts, tris = marching_cubes(-sdf, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    # rescale grid coords to world
    w = verts / (n - 1) * 2.0 - 1.0
    rad = np.linalg.norm(w, axis=1)
    assert abs(rad.mean() - r) < 0.01
    assert rad.std() < 0.01
    # all triangle indices valid, every vertex referenced
    assert tris.min() >= 0 and tris.max() < len(verts)
    # closed surface: Euler characteristic of a sphere V - E + F = 2
    edges = set()
    for a, b, c in tris:
        for e in ((a, b), (b, c), (c, a)):
            edges.add((min(e), max(e)))
    assert len(verts) - len(edges) + len(tris) == 2
