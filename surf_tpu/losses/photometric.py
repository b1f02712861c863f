"""Photometric warping loss on matching-field depths.

Functional re-design of models/losses/photometric_loss.py: warp source
images into the reference view by reprojecting the rendered depth map, then
penalize SSIM + smooth-L1 + image-gradient smooth-L1 differences, each
taking the ``topk`` lowest values across source views per pixel and
normalizing by the reference mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bilinear_sample_2d, pixel_to_normalized
from ..ops.projection import invert_pose, invert_intrinsics


def _avg_pool3(x):
    """3x3 stride-1 mean pool, VALID (input already padded). x: (n,H,W,c)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
    return s / 9.0


def _reflect_pad(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def ssim_loss_map(x, y, mask):
    """(1 - SSIM)/2 per pixel, mask-pooled (reference SSIM module,
    photometric_loss.py:6-33).  x, y: (n, H, W, c); mask (n, H, W, 1)."""
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    x = _reflect_pad(x)
    y = _reflect_pad(y)
    mask = _reflect_pad(mask)
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x ** 2) - mu_x ** 2
    sigma_y = _avg_pool3(y ** 2) - mu_y ** 2
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return _avg_pool3(mask) * jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def smooth_l1(a, b):
    d = a - b
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def _topk_lowest(x, k, axis=0):
    return jnp.sort(x, axis=axis).take(indices=jnp.arange(k), axis=axis)


def _select_others(arr, ref_idx, nv):
    """All views except ``ref_idx`` (traced), preserving order — static-shape
    replacement for the reference's torch.cat of slices
    (photometric_loss.py:64-68)."""
    is_ref = jnp.arange(nv) == ref_idx
    order = jnp.argsort(is_ref, stable=True)  # non-ref views first, in order
    return jnp.take(arr, order[: nv - 1], axis=0)


def compute_ptloss(depth, imgs, mask_ref, intrs, c2ws, ref_idx=0, topk=2):
    """
    depth: (H, W) rendered reference-view depth
    imgs: (nv, H, W, 3); mask_ref: (H, W); intrs/c2ws: (nv, 4, 4)
    ref_idx may be traced (the random source view).
    """
    nv, H, W, _ = imgs.shape
    ridx = jnp.asarray(ref_idx)
    ref_img = jnp.take(imgs, ridx, axis=0)[None]             # (1,H,W,3)
    ref_intr = jnp.take(intrs, ridx, axis=0)
    ref_c2w = jnp.take(c2ws, ridx, axis=0)
    src_imgs = _select_others(imgs, ridx, nv)
    src_intrs = _select_others(intrs, ridx, nv)
    src_c2ws = _select_others(c2ws, ridx, nv)
    nsrc = nv - 1
    topk = min(topk, nsrc)

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
    cam = (pix * depth.reshape(-1, 1)) @ invert_intrinsics(ref_intr).T
    world = cam @ ref_c2w[:3, :3].T + ref_c2w[:3, 3]

    warped = []
    masks = []
    for s in range(nsrc):
        w2c = invert_pose(src_c2ws[s])
        c = world @ w2c[:3, :3].T + w2c[:3, 3]
        proj = c @ src_intrs[s][:3, :3].T
        z = proj[:, 2]
        xy = proj[:, :2] / (z[:, None] + 1e-8)
        grid = pixel_to_normalized(xy, (H, W))
        m = (jnp.abs(grid[:, 0]) <= 1) & (jnp.abs(grid[:, 1]) <= 1) & (z > 0)
        warped.append(bilinear_sample_2d(src_imgs[s], grid, align_corners=True))
        masks.append(m)
    warp_imgs = jnp.stack(warped).reshape(nsrc, H, W, 3)
    mask = jnp.stack(masks).reshape(nsrc, H, W, 1)

    mref = mask_ref.reshape(1, H, W, 1)
    ssim = ssim_loss_map(warp_imgs, jnp.broadcast_to(ref_img, warp_imgs.shape),
                         (mask * (mref > 0.5)).astype(jnp.float32)).mean(-1, keepdims=True)
    ssim = _topk_lowest(ssim, topk)
    ssim = (ssim * mref).sum() / (mref.sum() + 1e-8)

    l1 = smooth_l1(warp_imgs, ref_img).mean(-1, keepdims=True)
    l1 = _topk_lowest(l1, topk)
    l1 = (l1 * mref).sum() / (mref.sum() + 1e-8)

    ref_dy = ref_img[:, :-1] - ref_img[:, 1:]
    ref_dx = ref_img[:, :, :-1] - ref_img[:, :, 1:]
    mref_y = mref[:, :-1] * mref[:, 1:]
    mref_x = mref[:, :, :-1] * mref[:, :, 1:]
    w_dy = warp_imgs[:, :-1] - warp_imgs[:, 1:]
    w_dx = warp_imgs[:, :, :-1] - warp_imgs[:, :, 1:]
    gx = _topk_lowest(smooth_l1(w_dx, ref_dx).mean(-1, keepdims=True), topk)
    gx = (gx * mref_x).sum() / (mref_x.sum() + 1e-8)
    gy = _topk_lowest(smooth_l1(w_dy, ref_dy).mean(-1, keepdims=True), topk)
    gy = (gy * mref_y).sum() / (mref_y.sum() + 1e-8)

    return l1 + gx + gy + ssim
