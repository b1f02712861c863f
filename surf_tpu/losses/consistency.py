"""Cross-view depth/coordinate reprojection consistency loss.

Functional re-design of models/losses/consistency_loss.py:5-58 (its call
site is commented out in the reference loss, loss.py:63, but the component
is part of the public surface): reproject the reference depth map into the
source view, fetch the source depth there, project back, and penalize
relative depth difference (< 1% gate) plus reprojection coordinate drift
(< 1 px gate, weighted 0.1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bilinear_sample_2d, pixel_to_normalized
from ..ops.projection import invert_intrinsics


def compute_consistency_loss(ref_depth, src_depth, intrs, c2ws, src_idx,
                             mask_ref, mask_src):
    ref_intr = intrs[0]
    src_intr = jnp.take(intrs, jnp.asarray(src_idx), axis=0)
    ref_c2w = c2ws[0]
    src_c2w = jnp.take(c2ws, jnp.asarray(src_idx), axis=0)
    H, W = ref_depth.shape

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).reshape(-1, 3)
    ref_xy = pix[:, :2]

    cam = (pix * ref_depth.reshape(-1, 1)) @ invert_intrinsics(ref_intr).T
    world = cam @ ref_c2w[:3, :3].T + ref_c2w[:3, 3]
    src_cam = (world - src_c2w[:3, 3]) @ src_c2w[:3, :3]
    src_proj = src_cam @ src_intr[:3, :3].T
    src_xy = src_proj[:, :2] / (src_proj[:, 2:] + 1e-8)

    grid = pixel_to_normalized(src_xy, (H, W))
    warp_depth = bilinear_sample_2d(src_depth[..., None], grid,
                                    align_corners=True)[..., 0]

    src_pix = jnp.concatenate([src_xy, jnp.ones_like(src_xy[:, :1])], -1)
    back_cam = (src_pix * warp_depth[:, None]) @ invert_intrinsics(src_intr).T
    back_world = back_cam @ src_c2w[:3, :3].T + src_c2w[:3, 3]
    back_ref_cam = (back_world - ref_c2w[:3, 3]) @ ref_c2w[:3, :3]
    depth_proj = back_ref_cam[:, 2].reshape(H, W)
    back_proj = back_ref_cam @ ref_intr[:3, :3].T
    back_xy = back_proj[:, :2] / (back_proj[:, 2:] + 1e-8)

    depth_diff = jnp.abs(ref_depth - depth_proj) / (ref_depth + 1e-8)
    depth_mask = jax.lax.stop_gradient(
        (depth_diff < 0.01).astype(jnp.float32)) * mask_ref
    depth_loss = (depth_diff * depth_mask).sum() / (depth_mask.sum() + 1e-8)

    coord_diff = jnp.abs(ref_xy - back_xy).mean(-1)
    coord_mask = jax.lax.stop_gradient(
        (coord_diff < 1.0).astype(jnp.float32)) * mask_ref.reshape(-1)
    coord_loss = (coord_diff * coord_mask).sum() / (coord_mask.sum() + 1e-8)

    return depth_loss + coord_loss * 0.1
