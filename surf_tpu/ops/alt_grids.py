"""Alternative scene parameterizations the reference ships as projector
extras (projector.py:423-482): spherical (inverted-sphere background) volume
lookup and triplane lookup.  Unused by the main pipeline but part of the
component surface; all arbitrarily differentiable."""

from __future__ import annotations

import math

import jax.numpy as jnp

from .grid_sample import trilinear_sample_3d, bilinear_sample_2d


def equirect2sphere(pts):
    """(n,3) xyz -> (n,3) (theta, phi, 1/r) with r clipped to >= 1
    (projector.py:423-439)."""
    dist = jnp.clip(jnp.linalg.norm(pts, axis=1, keepdims=True), 1.0, 1e10)
    unit = pts / dist
    r = 1.0 / dist
    theta = jnp.arcsin(unit[:, 2:3])
    phi = jnp.arctan2(unit[:, 1:2], unit[:, 0:1])
    return jnp.concatenate([theta, phi, r], axis=1)


def lookup_sphe_volume(sphe_pts, volume, align_corners=False):
    """Sample a volume indexed by normalized spherical coords
    (projector.py:441-450)."""
    theta = sphe_pts[:, 0:1] / (math.pi / 2)
    phi = sphe_pts[:, 1:2] / math.pi
    r = ((sphe_pts[:, 2:3] - 1e-10) / (1 - 1e-10) - 0.5) * 2
    norm = jnp.concatenate([theta, phi, r], axis=1)
    return trilinear_sample_3d(volume, norm, align_corners=align_corners)


def lookup_triplane(pts, triplanes, align_corners=False):
    """Triplane feature lookup: sum of xy/xz/yz plane samples, concatenated
    across pyramid entries (projector.py:453-482).

    triplanes: list of dicts {'xy','xz','yz'} of (H, W, C) feature planes.
    """
    feats = []
    for tri in triplanes:
        xy = pts[:, :2]
        xz = jnp.stack([pts[:, 0], pts[:, 2]], axis=-1)
        yz = jnp.stack([pts[:, 1], pts[:, 2]], axis=-1)
        f = (bilinear_sample_2d(tri["xy"], xy, align_corners=align_corners)
             + bilinear_sample_2d(tri["xz"], xz, align_corners=align_corners)
             + bilinear_sample_2d(tri["yz"], yz, align_corners=align_corners))
        feats.append(f)
    return jnp.concatenate(feats, axis=-1)
