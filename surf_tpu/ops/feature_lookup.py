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

from .grid_sample import (bilinear_sample_2d, bilinear_sample_packed,
                          pack_bilinear_corners)
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


def fuse_pyramid(imgs, features):
    """Pre-concatenate RGB + all pyramid levels at the finest resolution
    (bilinear 2x upsampling per level), once per scene.

    With this, ``lookup_feature_fused`` needs ONE bilinear gather per source
    view instead of one per pyramid level — the dominant cost in the color
    path on TPU (gathers are latency-bound).  Values differ from the exact
    per-level sampling only by sub-pixel alignment of the upsampling grid.
    """
    from .grid_sample import resize_bilinear_2d
    hw = features[0].shape[1:3]
    ups = [imgs, features[0]]
    for f in features[1:]:
        ups.append(jax.vmap(lambda m: resize_bilinear_2d(m, hw))(f))
    return jnp.concatenate(ups, axis=-1)          # (nv, H, W, 3 + c*L)


@jax.tree_util.register_pytree_node_class
class PackedPyramid:
    """Corner-packed fused pyramid for the SOURCE views: ``packed`` is
    (nsrc, H+1, W+1, 4C) from ``pack_bilinear_corners`` over each source
    view's fused (RGB + upsampled features) map.  One row gather fetches a
    bilinear sample's whole 2x2 footprint (4x fewer gather descriptors in
    the render color path — PERF_NOTES gather cost model: cost is per ROW).
    ``hw`` is static (pytree aux) so jitted consumers see Python ints."""

    def __init__(self, packed, hw):
        self.packed = packed
        self.hw = tuple(hw)

    def tree_flatten(self):
        return (self.packed,), self.hw

    @classmethod
    def tree_unflatten(cls, hw, children):
        return cls(children[0], hw)


def pack_fused(fused, dtype=None):
    """(nv, H, W, C) fused pyramid -> PackedPyramid over views 1..nv-1 (the
    reference view is never color-sampled).  ``dtype`` (e.g. bfloat16)
    halves the packed table; the lerp output is cast back to fused.dtype."""
    src = fused[1:]
    if dtype is not None:
        src = src.astype(dtype)
    packed = jax.vmap(pack_bilinear_corners)(src)
    return PackedPyramid(packed, tuple(fused.shape[1:3]))


def lookup_feature_packed(pts, pp, intrs, c2ws, hw_levels, out_dtype=None):
    """``lookup_feature_fused`` over a PackedPyramid: numerically equal to
    the unpacked form (up to the packed table's dtype) with one gather per
    (source view, point)."""
    src_intrs = intrs[1:]
    src_c2ws = c2ws[1:]
    h, w = pp.hw

    ray_diff = compute_ray_diff(pts, c2ws[0], src_c2ws)

    xy, depth = project_points_all(pts, src_intrs, src_c2ws)   # (s, n, ...)
    xy = jax.lax.stop_gradient(xy)
    depth = jax.lax.stop_gradient(depth)
    grid = pixel_to_normalized(xy, (h, w))
    warped = jax.vmap(
        lambda f, g: bilinear_sample_packed(f, g, (h, w), align_corners=False)
    )(pp.packed, grid)                                          # (s, n, C)
    if out_dtype is not None:
        warped = warped.astype(out_dtype)
    rgb_feat = jnp.transpose(warped, (1, 0, 2))

    mask = depth > 0
    for i, (hi, wi) in enumerate(hw_levels):
        sc = 0.5 ** i
        xi = xy[..., 0] * sc
        yi = xy[..., 1] * sc
        mask = mask & (xi >= 0) & (xi < wi) & (yi >= 0) & (yi < hi)
    return rgb_feat, ray_diff, jnp.transpose(mask, (1, 0))


def lookup_feature_fused(pts, fused, intrs, c2ws, hw_levels):
    """Fused-pyramid variant of ``lookup_feature``.

    fused: (nv, h, w, 3 + c*L) from ``fuse_pyramid``; hw_levels: list of the
    original per-level (h_i, w_i) used for the per-level visibility bounds
    (projector.py:536 checks half-open bounds at every level).
    Returns the same (rgb_feat, ray_diff, mask) triple.
    """
    src_intrs = intrs[1:]
    src_c2ws = c2ws[1:]
    h, w = fused.shape[1:3]

    ray_diff = compute_ray_diff(pts, c2ws[0], src_c2ws)

    xy, depth = project_points_all(pts, src_intrs, src_c2ws)   # (s, n, ...)
    xy = jax.lax.stop_gradient(xy)
    depth = jax.lax.stop_gradient(depth)
    grid = pixel_to_normalized(xy, (h, w))
    warped = jax.vmap(
        lambda f, g: bilinear_sample_2d(f, g, align_corners=False)
    )(fused[1:], grid)                                          # (s, n, C)
    rgb_feat = jnp.transpose(warped, (1, 0, 2))

    # per-level masks from scaled pixel coordinates (no gathers needed)
    mask = depth > 0
    for i, (hi, wi) in enumerate(hw_levels):
        sc = 0.5 ** i
        xi = xy[..., 0] * sc
        yi = xy[..., 1] * sc
        mask = mask & (xi >= 0) & (xi < wi) & (yi >= 0) & (yi < hi)
    return rgb_feat, ray_diff, jnp.transpose(mask, (1, 0))
