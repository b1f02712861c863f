"""Project 3D sample points into source views and gather multi-scale image
features + RGB for the blending network.

Functional re-design of the reference's ``lookup_feature``
(models/modules/projector.py:501-556): intrinsics are scaled by 0.5^i per
pyramid level, masks require the point to project strictly inside every
level (half-open bounds), and RGB comes from the finest level only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import bilinear_sample_2d
from .projection import project_points_all, pixel_to_normalized, compute_ray_diff


def lookup_feature(pts, imgs, intrs, c2ws, features):
    """
    pts: (n, 3); imgs: (nv, H, W, 3); intrs/c2ws: (nv, 4, 4);
    features: list of (nv, h_i, w_i, c), **finest first** (the renderer
    passes the FPN outputs reversed, surf.py:159).

    Returns (rgb_feat (n, nsrc, 3 + c*L), ray_diff (n, nsrc, 4),
             mask (n, nsrc)).
    """
    src_intrs = intrs[1:]
    src_c2ws = c2ws[1:]
    nsrc = src_intrs.shape[0]
    n = pts.shape[0]

    ray_diff = compute_ray_diff(pts, c2ws[0], src_c2ws)

    warped_levels = []
    masks = []
    warped_rgb = None
    for i, feat in enumerate(features):
        h, w = feat.shape[1:3]
        scale = 0.5 ** i
        intrs_i = src_intrs.at[:, :2].multiply(scale)
        xy, depth = project_points_all(pts, intrs_i, src_c2ws)  # (s, n, ...)
        xy = jax.lax.stop_gradient(xy)
        depth = jax.lax.stop_gradient(depth)
        m = (depth > 0) & (xy[..., 0] >= 0) & (xy[..., 0] < w) & \
            (xy[..., 1] >= 0) & (xy[..., 1] < h)
        grid = pixel_to_normalized(xy, (h, w))
        # F.grid_sample default align_corners=False (projector.py:544)
        warped = jax.vmap(
            lambda f, g: bilinear_sample_2d(f, g, align_corners=False)
        )(feat[1:], grid)                                       # (s, n, c)
        warped_levels.append(jnp.transpose(warped, (1, 0, 2)))  # (n, s, c)
        masks.append(jnp.transpose(m, (1, 0)))                  # (n, s)
        if i == 0:
            rgb = jax.vmap(
                lambda f, g: bilinear_sample_2d(f, g, align_corners=False)
            )(imgs[1:], grid)
            warped_rgb = jnp.transpose(rgb, (1, 0, 2))          # (n, s, 3)

    warped = jnp.concatenate(warped_levels, axis=-1)
    mask = jnp.stack(masks, axis=-1).all(axis=-1)
    rgb_feat = jnp.concatenate([warped_rgb, warped], axis=-1)
    return rgb_feat, ray_diff, mask
