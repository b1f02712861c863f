"""Homography-based surface patch warping for multi-view consistency.

Functional re-design of the reference's ``surface_patch_warp2`` /
``patch_homography`` (models/modules/projector.py:560-644): at each surface
point (SDF zero crossing) with unit normal n (in the reference camera
frame), build per-source-view 3x3 plane-induced homographies

    H_i = K_i (R_i^T R_0 + (R_i^T (C_0 - C_i)) n^T / (n . x_ref)) K_0^{-1}

and sample ``patch_size`` x ``patch_size`` feature patches around the
point's reference projection in both the reference and each source view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import bilinear_sample_2d


def surface_patch_warp(pts, normals_ref, images, intrs, c2ws, patch_size=11):
    """
    pts: (n, 3) world points on the surface
    normals_ref: (n, 3) unit normals in the *reference camera* frame
    images: (nv, H, W, C) feature images (view 0 = reference)
    intrs, c2ws: (nv, 4, 4)
    Returns (ref_patches (n, p*p, C), src_patches (nsrc, n, p*p, C)).
    """
    n = pts.shape[0]
    H_img, W_img = images.shape[1:3]
    nsrc = images.shape[0] - 1

    from .projection import invert_intrinsics
    K_ref = intrs[0, :3, :3]
    K_ref_inv = invert_intrinsics(intrs[0])
    K_src = intrs[1:, :3, :3]
    R0 = c2ws[0, :3, :3]          # ref cam -> world rotation
    C0 = c2ws[0, :3, 3]
    R_src_T = jnp.transpose(c2ws[1:, :3, :3], (0, 2, 1))  # world -> src cam
    C_src = c2ws[1:, :3, 3]

    # reference-camera coordinates of the points
    pts_ref = (pts - C0) @ R0      # (n,3): R0^T (x - C0)
    proj = pts_ref @ K_ref.T       # (n,3)
    px = proj[:, 0] / (proj[:, 2] + 1e-8)
    py = proj[:, 1] / (proj[:, 2] + 1e-8)
    disp = jnp.sum(normals_ref * pts_ref, axis=-1)  # (n,)

    # homographies (n, nsrc, 3, 3)
    R_rel = jnp.einsum("sij,jk->sik", R_src_T, R0)            # (s,3,3)
    t_rel = jnp.einsum("sij,sj->si", R_src_T, C0[None] - C_src)  # (s,3)
    outer = t_rel[None, :, :, None] * normals_ref[:, None, None, :]  # (n,s,3,3)
    M = R_rel[None] + outer / (disp[:, None, None, None] + 1e-10)
    Hom = jnp.einsum("sij,nsjk,kl->nsil", K_src, M, K_ref_inv)

    # patch pixel offsets, (x, y) ordering as the reference (projector.py:603)
    hp = patch_size // 2
    offs = jnp.arange(-hp, hp + 1, dtype=pts.dtype)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    offsets = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (p*p, 2) x,y
    pp = patch_size * patch_size

    pixels = jnp.stack([px, py], axis=-1)                # (n, 2)
    patch_xy = pixels[:, None, :] + offsets[None]        # (n, p*p, 2)

    # warp patch pixels through the homographies
    homo = jnp.concatenate([patch_xy, jnp.ones_like(patch_xy[..., :1])], axis=-1)
    warped = jnp.einsum("nsij,npj->nspi", Hom, homo)     # (n, s, p*p, 3)
    grid = warped[..., :2] / (warped[..., 2:] + 1e-8)    # pixel coords in src

    def norm_grid(g):
        gx = 2.0 * g[..., 0] / (W_img - 1) - 1.0
        gy = 2.0 * g[..., 1] / (H_img - 1) - 1.0
        return jnp.stack([gx, gy], axis=-1)

    src_grid = norm_grid(grid)                            # (n, s, p*p, 2)
    src_patches = jax.vmap(
        lambda img, g: bilinear_sample_2d(img, g, align_corners=True)
    )(images[1:], jnp.transpose(src_grid, (1, 0, 2, 3)))  # (s, n, p*p, C)

    ref_grid = jax.lax.stop_gradient(norm_grid(patch_xy))
    ref_patches = bilinear_sample_2d(images[0], ref_grid, align_corners=True)
    return ref_patches, src_patches
