"""Matching field: per-view depth maps rendered from the 1-channel density
volume, driving the end-to-end sparsification cascade.

Functional re-design of models/modules/matching_field.py:8-141:

  * per view, a ray grid at ``img_hw / depth_res_levels[stage]``;
  * per ray, ``n_samples_depths[stage]`` z-vals uniformly in the current
    stage's band **and** the previous stage's band centered on the previous
    depth (clamped/shifted to the original near/far), merged and sorted;
  * density = trilinear lookup of the matching volume; depth = softmax
    expectation of z, converted to camera depth via the ray-z cosine;
  * an occupancy regularizer penalizing density near the camera and outside
    the unit sphere;
  * gradients flow only through the reference view and the sampled source
    view (matching_field.py:129-133) — realized with a differentiable
    ``where(keep, x, stop_gradient(x))`` gate so the view loop stays static
    under jit even though ``src_idx`` is a traced value;
  * depths bilinearly upsampled to full image resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import (
    trilinear_sample_3d, trilinear_sample_3d_cm, pack_trilinear_corners,
    trilinear_sample_packed_3d, resize_bilinear_2d, make_pixel_grid,
    pixels_to_rays, ray_z_cos,
)

# corner-pack the (stop-gradient) matching volume for the all-views pass
# when the packed copy stays under this many bytes (8x the volume)
_PACK_BYTES_LIMIT = 800 * 1024 * 1024


def _band_from_depth(pre_z_val, stage_range, near_ori, far_ori):
    """Band [z - r/2, z + r/2] shifted/clamped into [near_ori, far_ori]
    (matching_field.py:108-113)."""
    near = pre_z_val - stage_range / 2.0
    far = pre_z_val + stage_range / 2.0
    near = jnp.where(far > far_ori, near - (far - far_ori), near)
    far = jnp.where(near < near_ori, far + (near_ori - near), far)
    near = jnp.clip(near, near_ori, far_ori)
    far = jnp.clip(far, near_ori, far_ori)
    return near, far


def depth_render(key, rays_o, rays_d, near, far, c2w, matching_volume,
                 n_samples: int, *, perturb: bool, perturb_gate=None,
                 packed_dims=None):
    """near/far: (nr, k) — one column per sampling band.

    ``perturb_gate`` (traced bool) zeroes the jitter for views the reference
    renders unperturbed (matching_field.py:133 passes perturb=False for
    non-ref/src views).
    With ``packed_dims`` the volume is a ``pack_trilinear_corners`` copy of
    the original (X, Y, Z) = packed_dims volume (value-only passes).
    Returns (render_depth (nr,), occ_reg scalar).
    """
    nr, k = near.shape
    lin = jnp.linspace(0.0, 1.0, n_samples)
    z = near[..., None] + (far - near)[..., None] * lin  # (nr, k, n)
    if perturb:
        t_rand = jax.random.uniform(key, (nr, 1)) - 0.5
        if perturb_gate is not None:
            t_rand = t_rand * perturb_gate.astype(t_rand.dtype)
        z = z + (t_rand[..., None] * (far - near)[:, :, None]) / n_samples
    z_vals = jnp.sort(z.reshape(nr, k * n_samples), axis=-1)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    pts_norm = jnp.linalg.norm(pts, axis=-1)
    outside_sphere = jax.lax.stop_gradient((pts_norm > 1.0).astype(jnp.float32))

    # reference samples the density volume through F.grid_sample defaults
    # (align_corners=False), matching_field.py:48 -> projector.py:406
    if packed_dims is not None:
        density = trilinear_sample_packed_3d(
            matching_volume, pts, packed_dims, align_corners=False)[..., 0]
    else:
        # channel-major d_volume scatter (the autodiff scatter into
        # (R, R, R, 1) pads the 1-channel minor dim to the 128-lane tile)
        density = trilinear_sample_3d_cm(matching_volume, pts,
                                         align_corners=False)[..., 0]
    weights = jax.nn.softmax(density, axis=-1)

    cos = ray_z_cos(rays_d, c2w)
    render_z = jnp.sum(z_vals * weights, axis=-1)
    render_depth = render_z * cos

    occ_reg = jnp.mean(density[:, :6]) + \
        jnp.sum(density * outside_sphere) / (jnp.sum(outside_sphere) + 1e-10)
    return render_depth, occ_reg


def apply(key, conf_static, ipts, matching_volume, stage_idx, range_ratios,
          pre_depths=None, *, perturb=False, grad_views_only=False):
    """Render per-view depth maps at the stage's resolution level.

    conf_static: dict with n_samples_depths / depth_res_levels lists.
    ipts: dict with imgs (nv,H,W,3), intrs (nv,4,4), c2ws (nv,4,4),
      near_fars (nv,2), and optionally src_idx (traced int).
    Returns (depths (nv, H, W), occ_regs (nv,)).

    Gradients flow only through the reference view and the sampled source
    view (reference matching_field.py:129-133).  Structurally: one
    stop-gradient pass over ALL views (no backward cost at all), plus a
    differentiable re-render of views {0, src_idx} merged in — the backward
    then pays the dense-volume scatter for exactly 2 views instead of nv.
    With ``grad_views_only`` (the LAST cascade stage, whose depths feed no
    further filtering) the all-views pass is skipped entirely and non-grad
    views return zeros.
    """
    intrs = ipts["intrs"]
    c2ws = ipts["c2ws"]
    near_fars = ipts["near_fars"]
    src_idx = ipts.get("src_idx", 0)
    img_h, img_w = ipts["imgs"].shape[1:3]

    level = conf_static["depth_res_levels"][stage_idx]
    n_samples = conf_static["n_samples_depths"][stage_idx]
    h, w = img_h // level, img_w // level
    pixels = make_pixel_grid((img_h, img_w), (h, w))  # (h*w, 2)

    nv = intrs.shape[0]
    keys = jax.random.split(key, nv)
    keep_grad = (jnp.arange(nv) == 0) | (jnp.arange(nv) == jnp.asarray(src_idx))

    def per_view(k, intr, c2w, near_far, pre_depth, keep, mv,
                 packed_dims=None):
        rays_o, rays_d = pixels_to_rays(pixels, intr, c2w)
        near_ori, far_ori = near_far[0], near_far[1]
        if pre_depths is not None:
            pre = jax.lax.stop_gradient(pre_depth)
            px = jnp.floor(pixels[:, 0]).astype(jnp.int32)
            py = jnp.floor(pixels[:, 1]).astype(jnp.int32)
            cos = ray_z_cos(rays_d, c2w)
            pre_z = pre[py, px] / cos
            base_range = far_ori - near_ori
            near_s, far_s = _band_from_depth(
                pre_z, base_range * range_ratios[stage_idx], near_ori, far_ori)
            near_p, far_p = _band_from_depth(
                pre_z, base_range * range_ratios[stage_idx - 1], near_ori, far_ori)
            near = jnp.stack([near_s, near_p], axis=-1)
            far = jnp.stack([far_s, far_p], axis=-1)
        else:
            near = jnp.full((rays_o.shape[0], 1), near_ori)
            far = jnp.full((rays_o.shape[0], 1), far_ori)

        d, occ = depth_render(k, rays_o, rays_d, near, far, c2w,
                              mv, n_samples,
                              perturb=perturb, perturb_gate=keep,
                              packed_dims=packed_dims)
        d = d.reshape(h, w)
        if level != 1:
            d = resize_bilinear_2d(d[..., None], (img_h, img_w))[..., 0]
        return d, occ

    pre_arg = pre_depths if pre_depths is not None \
        else jnp.zeros((nv, 1, 1), jnp.float32)

    if grad_views_only:
        depths_all = jnp.zeros((nv, img_h, img_w), jnp.float32)
        occ_all = jnp.zeros((nv,), jnp.float32)
    else:
        # value-only pass over every view, fully outside the autodiff graph
        # (sequential lax.map: one view's 704^3-volume gather indices live at
        # a time — a vmap would materialize all views' at once, ~12 GB)
        mv_stop = jax.lax.stop_gradient(matching_volume)
        X, Y, Z, C = matching_volume.shape
        packed_dims = None
        if (X + 1) * (Y + 1) * (Z + 1) * 8 * C \
                * matching_volume.dtype.itemsize <= _PACK_BYTES_LIMIT:
            # one 8C-row gather per sample instead of 8 scalar gathers
            mv_stop = pack_trilinear_corners(mv_stop)
            packed_dims = (X, Y, Z)

        def per_view_stop(args):
            k, intr, c2w, nf, pre, keep = jax.lax.stop_gradient(args)
            return per_view(k, intr, c2w, nf, pre, keep, mv_stop,
                            packed_dims=packed_dims)

        depths_all, occ_all = jax.lax.map(
            per_view_stop, (keys, intrs, c2ws, near_fars, pre_arg, keep_grad))
        depths_all = jax.lax.stop_gradient(depths_all)
        occ_all = jax.lax.stop_gradient(occ_all)

    # differentiable re-render of the two grad views (same keys -> identical
    # values), merged by index — bitwise equal to rendering all views with
    # per-view gradient gates, at 2/nv of the backward cost
    sel = jnp.stack([jnp.asarray(0, jnp.int32),
                     jnp.asarray(src_idx, jnp.int32).reshape(())])
    d_sel, occ_sel = jax.lax.map(
        lambda args: per_view(*args, keep=jnp.asarray(True),
                              mv=matching_volume),
        (keys[sel], intrs[sel], c2ws[sel], near_fars[sel], pre_arg[sel]))
    depths = depths_all.at[sel].set(d_sel)
    occ_regs = occ_all.at[sel].set(occ_sel)
    return depths, occ_regs
