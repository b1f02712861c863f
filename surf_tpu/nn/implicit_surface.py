"""NeuS-style neural surface renderer over the sparse volume cascade.

Functional re-design of models/modules/implicit_surface.py:50-435:

  * z-value construction (render, lines 268-311): 64 uniform samples over
    [near, far] plus surface-centric stages — a no-grad 256-sample density
    render of the matching volume locates the surface, then 32/24/16 extra
    samples in shrinking bands around it (clamped/shifted at the bounds);
  * render_core (lines 64-266): visibility-masked SDF MLP evaluation
    (invalid points pinned to sdf=100), first+second-order gradients,
    IBRNet color blending, NeuS alpha compositing with cos annealing,
    eikonal/smooth errors, a random sparse-SDF sample, the first
    zero-crossing surface depth with a gradient-cosine gate, and homography
    patch warping at the crossing for the NCC loss;
  * TPU-first: everything is compute-all + mask (no boolean indexing), all
    shapes static, randomness via explicit PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import core, sdf_net, blending_net, variance
from ..ops import (trilinear_sample_3d, PackedVolume, resize_bilinear_2d)
from ..ops import sparse as sp
from ..ops.feature_lookup import (lookup_feature, lookup_feature_fused,
                                  lookup_feature_packed, fuse_pyramid,
                                  PackedPyramid)
from ..ops.homography import surface_patch_warp


def init(key, conf):
    k1, k2 = jax.random.split(key)
    sdf_p, sdf_static = sdf_net.init(k1, conf["sdf_network"])
    blend_p, blend_static = blending_net.init(k2, conf["color_network"])
    params = {
        "sdf_network": sdf_p,
        "color_network": blend_p,
        "deviation_network": variance.init(conf["variance_network"]),
    }
    static = {
        "sdf": sdf_static,
        "blend": blend_static,
        "n_samples": conf.get_list("render.n_samples"),
        "sample_ranges": conf.get_list("render.sample_ranges"),
        "n_depth": conf.get_int("render.n_depth"),
        "perturb": conf.get_float("render.perturb"),
        # fuse the RGB+feature pyramid into one image per scene so the color
        # path does a single bilinear gather per source view (large TPU win;
        # disable for bit-exact parity with the reference's per-level
        # sampling when validating converted checkpoints)
        "fused_pyramid": conf.get_bool("render.fused_pyramid", default=True),
        # corner-pack the fused pyramid for validation renders: one row
        # gather per (source view, sample) instead of 4 (value path only;
        # table dtype below trades a ~1e-2-relative color deviation for
        # half the table bytes)
        "packed_pyramid": conf.get_bool("render.packed_pyramid",
                                        default=True),
        "packed_pyramid_dtype": conf.get_string(
            "render.packed_pyramid_dtype", default="bfloat16"),
        # run the IBRNet blending MLPs in this dtype (e.g. "bfloat16") —
        # only the softmax blend WEIGHTS see reduced precision; source RGBs
        # stay full precision.  None = full precision (default; training
        # and converted-checkpoint parity paths)
        "color_dtype": conf.get_string("render.color_dtype", default=None),
        # point-chunk size for the fused SDF value+gradients pass (bounds
        # the batch AD residuals; see sdf_net.value_features_grads).  With
        # channel-major dense lookups the unchunked graph overlaps phases
        # better (413 vs 467 ms at the full protocol) — chunk only beyond
        # 1M points
        "sdf_point_chunk": conf.get_int("render.sdf_point_chunk",
                                        default=1048576),
    }
    return params, static


def _safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """sqrt(sum(x^2)+eps): finite gradients at x=0, unlike jnp.linalg.norm.
    Needed because masked points carry exact-zero gradients/smooth vectors
    in the compute-all+mask design (the reference never evaluates norms at
    masked points thanks to boolean indexing)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def occupancy_mask(grids, pts):
    """Point visibility: nearest-voxel occupancy in ANY stage
    (implicit_surface.py:86: lookup_volume(mask_volumes,'nearest').any).

    ``grids`` may be the per-stage VoxelGrid list or a precomputed
    sp.OccupancyVolume (one gather per point instead of one per stage)."""
    if isinstance(grids, sp.OccupancyVolume):
        return sp.occupancy_lookup(grids, pts)
    m = None
    for g in grids:
        o = sp.occupancy_nearest(g, pts, align_corners=False)
        m = o if m is None else (m | o)
    return m


def _band(center, half_range, near, far):
    lo = center - half_range
    hi = center + half_range
    lo = jnp.where(hi > far, lo - (hi - far), lo)
    hi = jnp.where(lo < near, hi + (near - lo), hi)
    return jnp.clip(lo, near, far), jnp.clip(hi, near, far)


def build_z_vals(key, static, rays_o, rays_d, near, far, matching_volume):
    """Surface-centric sample placement (implicit_surface.py:268-311).
    near/far: (nr, 1).  Returns z_vals (nr, sum(n_samples)) sorted.

    ``matching_volume`` is either the (X, Y, Z, 1) density volume or an
    ``ops.PackedVolume`` (corner-packed): the 256-sample density pre-render
    is value-only (everything here is stop-gradient), so the corner-packed
    table cuts its gather count 8x (full) / 4x (yz) — the pre-render was
    ~100 ms of the protocol-scale render (PERF_NOTES)."""
    n0 = static["n_samples"][0]
    nr = rays_o.shape[0]
    k_uni, k_surf, k_stage = jax.random.split(key, 3)

    lin = jnp.linspace(0.0, 1.0, n0)
    z_uniform = near + (far - near) * lin[None]
    if static["perturb"] > 0:
        t = jax.random.uniform(k_uni, (nr, 1)) - 0.5
        z_uniform = z_uniform + t * 2.0 / n0
    z_all = [z_uniform]

    # no-grad surface localization from the matching volume
    base_range = far - near
    lin_d = jnp.linspace(0.0, 1.0, static["n_depth"])
    z_d = near + (far - near) * lin_d[None]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_d[..., None]
    if isinstance(matching_volume, PackedVolume):
        density = matching_volume.sample(pts, align_corners=False)[..., 0]
    else:
        density = trilinear_sample_3d(
            matching_volume, pts, align_corners=False)[..., 0]
    w = jax.nn.softmax(density, axis=-1)
    surf_z = jax.lax.stop_gradient(jnp.sum(z_d * w, axis=-1, keepdims=True))

    stage_keys = jax.random.split(k_stage, len(static["n_samples"]) - 1)
    for i, (ratio, ns) in enumerate(zip(static["sample_ranges"][1:], static["n_samples"][1:])):
        lo, hi = _band(surf_z, base_range * ratio, near, far)
        z_s = lo + (hi - lo) * jnp.linspace(0.0, 1.0, ns)[None]
        if static["perturb"] > 0:
            t = jax.random.uniform(stage_keys[i], (nr, 1)) - 0.5
            z_s = z_s + t * (hi - lo) / ns
        z_all.append(jax.lax.stop_gradient(z_s))

    return jnp.sort(jnp.concatenate(z_all, axis=-1), axis=-1)


def prepare_patch_features(features, match_features, step):
    """Per-scene patch-warp feature image: concat of the 3 finest maps
    upsampled to full resolution, switching to the frozen matching feature
    network from step >= 2 (implicit_surface.py:230-243).  Hoisted out of
    the per-ray-chunk render so validation does the resize once per scene.
    """
    def cat3(maps):
        hw = maps[0].shape[1:3]
        ups = [maps[0]] + [
            jax.vmap(lambda m: resize_bilinear_2d(m, hw))(mm) for mm in maps[1:3]]
        return jax.lax.stop_gradient(jnp.concatenate(ups, axis=-1))

    warp_a = cat3(features)
    if match_features is None:
        return warp_a
    warp_b = cat3(match_features)
    use_a = jnp.asarray(True) if step is None else (jnp.asarray(step) < 2)
    return jnp.where(use_a, warp_a, warp_b)


def neus_alpha_weights(sdf, gradients, dirs, dists, pts, vmask_f, inv_s,
                       cos_anneal_ratio):
    """NeuS section-estimate alpha compositing (reference
    implicit_surface.py:126-156): annealed iter_cos, sigmoid-CDF section
    estimates, cumprod transmittance, sphere masks.  Pure math — golden
    -tested against a torch port of the reference block
    (tests/test_networks.py::test_neus_core_golden).

    sdf (N,1), gradients/dirs (N,3), dists (nr,ns), pts (N,3), vmask_f (N,).
    Returns (alpha, weights, inside_sphere, relax_inside) each (nr, ns).
    """
    nr, ns = dists.shape
    true_cos = jnp.sum(dirs * gradients, axis=-1, keepdims=True)
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)
    iter_cos = iter_cos * vmask_f[:, None]

    d_flat = dists.reshape(-1, 1)
    est_next = sdf + jnp.clip(iter_cos, -10.0, 10.0) * d_flat * 0.5
    est_prev = sdf - jnp.clip(iter_cos, -10.0, 10.0) * d_flat * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    alpha = alpha.reshape(nr, ns) * vmask_f.reshape(nr, ns)

    pts_norm = jnp.linalg.norm(pts, axis=-1).reshape(nr, ns)
    inside_sphere = jax.lax.stop_gradient(
        (pts_norm < 1.0).astype(jnp.float32)) * vmask_f.reshape(nr, ns)
    relax_inside = jax.lax.stop_gradient(
        (pts_norm < 1.2).astype(jnp.float32)) * vmask_f.reshape(nr, ns)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((nr, 1)), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    return alpha, weights, inside_sphere, relax_inside


def neus_zero_crossing(sdf, grads_rs, mid_z, vmask_f, inside_sphere, ray_cos):
    """First SDF zero crossing along each ray with the reference's gates
    (implicit_surface.py:180-216): earliest valid sign-change pair, midpoint
    -inside-sphere, gradient-cos > 0.5, linear-interp z at sdf=0.  Golden
    -tested against a torch port of the reference block.

    Returns (mid_inside (nr,1), z_sdf0 (nr,1), sdf_depth (nr,1))."""
    nr, ns = mid_z.shape
    sdf_d = sdf.reshape(nr, ns)
    prev_sdf, next_sdf = sdf_d[:, :-1], sdf_d[:, 1:]
    vm_d = vmask_f.reshape(nr, ns)
    pair_valid = (vm_d[:, :-1] * vm_d[:, 1:]) > 0
    sign = (prev_sdf * next_sdf <= 0).astype(jnp.float32) * pair_valid
    idx_desc = jnp.arange(ns - 1, 0, -1, dtype=jnp.float32)[None]  # ns-1 .. 1
    tmp = sign * idx_desc
    prev_idx = jnp.argmax(tmp, axis=1, keepdims=True)
    next_idx = prev_idx + 1
    has_cross = (tmp.sum(-1, keepdims=True) > 0).astype(jnp.float32)

    take = lambda a, i: jnp.take_along_axis(a, i, axis=1)
    prev_in = take(inside_sphere, prev_idx)
    next_in = take(inside_sphere, next_idx)
    mid_inside = ((0.5 * (prev_in + next_in)) > 0.5).astype(jnp.float32) * has_cross

    grad_d = jax.lax.stop_gradient(grads_rs)
    g1 = jnp.take_along_axis(grad_d, jnp.repeat(prev_idx[..., None], 3, -1), axis=1)[:, 0]
    g2 = jnp.take_along_axis(grad_d, jnp.repeat(next_idx[..., None], 3, -1), axis=1)[:, 0]
    cos_d = jnp.sum(g1 * g2, -1) / (jnp.linalg.norm(g1, axis=-1)
                                    * jnp.linalg.norm(g2, axis=-1) + 1e-8)
    mid_inside = mid_inside * (cos_d[:, None] > 0.5)

    sdf1 = take(sdf_d, prev_idx)
    sdf2 = take(sdf_d, next_idx)
    z1 = take(mid_z, prev_idx)
    z2 = take(mid_z, next_idx)
    denom = sdf1 - sdf2
    denom = jnp.where(jnp.abs(denom) < 1e-6, jnp.where(denom < 0, -1e-6, 1e-6), denom)
    z_sdf0 = (sdf1 * z2 - sdf2 * z1) / denom
    sdf_depth = z_sdf0 * ray_cos[:, None] * mid_inside
    return mid_inside, z_sdf0, sdf_depth


def render_core(key, params, static, rays_o, rays_d, z_vals, sample_dist,
                stages, features, warp_feats, imgs, intrs, c2ws,
                cos_anneal_ratio, step, fused_colors=None, occ=None):
    """stages: list of (VoxelGrid, storage (P*8, 7)) fine-to-coarse.
    features: FPN maps finest-first; warp_feats: prepare_patch_features
    output."""
    nr, ns = z_vals.shape
    sdf_p = params["sdf_network"]
    sdf_s = static["sdf"]

    dists = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1],
         jnp.full((nr, 1), sample_dist, z_vals.dtype)], axis=-1)
    mid_z = z_vals + dists * 0.5
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (nr, ns, 3)).reshape(-1, 3)

    grids = occ if occ is not None else [g for g, _ in stages]
    vmask = occupancy_mask(grids, pts)                       # (N,)
    vmask_f = vmask.astype(pts.dtype)

    # SDF + features + first/second-order gradients everywhere in one
    # fused jvp-over-grad pass, pinned outside the active set
    sdf_out, grads_all, smooth_all = sdf_net.value_features_grads(
        sdf_p, sdf_s, pts, stages,
        chunk=static.get("sdf_point_chunk", None))
    sdf = jnp.where(vmask[:, None], sdf_out[:, :1], 100.0)
    feature_vec = sdf_out[:, 1:] * vmask_f[:, None]
    gradients = grads_all * vmask_f[:, None]
    smooth = smooth_all * vmask_f[:, None]

    # cross-view blended color
    if isinstance(fused_colors, PackedPyramid):
        hw_levels = [f.shape[1:3] for f in features]
        rgb_feat, ray_diff, src_mask = lookup_feature_packed(
            pts, fused_colors, intrs, c2ws, hw_levels,
            out_dtype=pts.dtype)
    elif fused_colors is not None:
        hw_levels = [f.shape[1:3] for f in features]
        rgb_feat, ray_diff, src_mask = lookup_feature_fused(
            pts, fused_colors, intrs, c2ws, hw_levels)
    else:
        rgb_feat, ray_diff, src_mask = lookup_feature(pts, imgs, intrs, c2ws, features)
    sampled_color = blending_net.apply(params["color_network"], static["blend"],
                                       rgb_feat, ray_diff, src_mask,
                                       compute_dtype=static.get("color_dtype"))
    sampled_color = (sampled_color * vmask_f[:, None]).reshape(nr, ns, 3)
    # ray validity: >=8 samples seen by >1 source view (lines 122-124)
    src_seen = jax.lax.stop_gradient(
        (src_mask & vmask[:, None]).sum(-1).reshape(nr, ns))
    valid_mask = ((src_seen > 1).astype(jnp.float32).sum(-1, keepdims=True) > 8)

    inv_s = jnp.clip(variance.inv_s(params["deviation_network"]), 1e-6, 1e6)

    alpha, weights, inside_sphere, relax_inside = neus_alpha_weights(
        sdf, gradients, dirs, dists, pts, vmask_f, inv_s, cos_anneal_ratio)
    weights_sum = weights.sum(-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    grads_rs = gradients.reshape(nr, ns, 3)
    normal_world = jnp.sum(grads_rs * weights[..., None], axis=1)
    rot = c2ws[0, :3, :3].T   # rigid: R^{-1} = R^T
    normal = normal_world @ rot.T

    cam_d = jnp.einsum("ij,nj->ni", rot, rays_d)
    ray_cos = cam_d[:, 2]
    render_depth = jnp.sum(mid_z * weights, axis=-1) * ray_cos

    gradient_error = ((_safe_norm(grads_rs) - 1.0) ** 2 * relax_inside).sum() \
        / (relax_inside.sum() + 1e-5)
    smooth_error = (_safe_norm(smooth).reshape(nr, ns) * inside_sphere).sum() \
        / (inside_sphere.sum() + 1e-5)

    # random sparse-SDF sample (lines 174-178)
    pts_random = jax.random.uniform(key, (1024, 3)) * 2.0 - 1.0
    rnd_mask = occupancy_mask(grids, pts_random)
    sdf_random = sdf_net.sdf_only(sdf_p, sdf_s, pts_random, stages)
    sdf_random = sdf_random * rnd_mask[:, None].astype(sdf_random.dtype)

    # first SDF zero crossing along each ray (lines 180-216)
    mid_inside, z_sdf0, sdf_depth = neus_zero_crossing(
        sdf, grads_rs, mid_z, vmask_f, inside_sphere, ray_cos)

    max_z = jnp.max(z_vals)
    z_sdf0 = jnp.where((z_sdf0 < 0) | (z_sdf0 > max_z), 0.0, z_sdf0)
    pts_sdf0 = rays_o + rays_d * z_sdf0                      # (nr, 3)
    grad_sdf0, _ = sdf_net.gradient(sdf_p, sdf_s, pts_sdf0, stages)
    gnorm = jnp.linalg.norm(grad_sdf0, axis=-1, keepdims=True)
    gnorm = jnp.where(gnorm <= 0, 1e-8, gnorm)
    grad_sdf0 = grad_sdf0 / gnorm
    # to the reference camera frame, detached (line 228)
    grad_sdf0 = jax.lax.stop_gradient(grad_sdf0 @ c2ws[0, :3, :3])

    ref_gray, sampled_gray = surface_patch_warp(
        pts_sdf0, grad_sdf0, warp_feats, intrs, c2ws)

    return {
        "ref_gray_val": ref_gray,
        "sampled_gray_val": sampled_gray,
        "mid_inside_sphere": mid_inside,
        "smooth_error": smooth_error,
        "color_fine": color,
        "render_depth": render_depth,
        "valid_mask": valid_mask,
        "sparse_sdf": jnp.concatenate([sdf_random, sdf]),
        "mid_z_vals": jax.lax.stop_gradient(mid_z),
        "gradients": grads_rs,
        "normal": normal,
        "s_val": 1.0 / inv_s,
        "weights": weights,
        "weight_sum": weights_sum,
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
        "sdf_depth": sdf_depth,
    }


def render(key, params, static, rays_o, rays_d, near, far, matching_volume,
           stages, features, match_features, imgs, intrs, c2ws,
           cos_anneal_ratio=1.0, step=None, warp_feats=None, occ=None,
           fused_colors=None):
    # fold weight-norm (v, g) -> w once per render: the SDF MLP is
    # re-evaluated per up-sample step and per lax.map chunk under
    # forward-over-reverse AD, and the per-call re-normalization (plus its
    # jvp/transpose graphs) is pure repeated work (PERF_NOTES round-5 #1)
    params = core.materialize_weight_norm(params)
    if near.shape[0] == 1:
        near = jnp.broadcast_to(near, (rays_o.shape[0], 1))
        far = jnp.broadcast_to(far, (rays_o.shape[0], 1))
    if warp_feats is None:
        warp_feats = prepare_patch_features(features, match_features, step)
    if fused_colors is None and static.get("fused_pyramid", False):
        # per-scene work — callers rendering many chunks should precompute
        # via fuse_pyramid() once (at 576x800 this is ~200 MB of resize+
        # concat per call otherwise)
        fused_colors = fuse_pyramid(imgs, features)
    k_z, k_core = jax.random.split(key)
    sample_dist = 2.0 / static["n_samples"][0]
    z_vals = build_z_vals(k_z, static, rays_o, rays_d, near, far, matching_volume)
    return render_core(k_core, params, static, rays_o, rays_d, z_vals,
                       sample_dist, stages, features, warp_feats, imgs,
                       intrs, c2ws, cos_anneal_ratio, step,
                       fused_colors=fused_colors, occ=occ)


def pseudo_sdf(params, static, pseudo_pts, stages, occ=None):
    """|SDF| supervision at pseudo points (implicit_surface.py:425-434)."""
    grids = occ if occ is not None else [g for g, _ in stages]
    m = occupancy_mask(grids, pseudo_pts)
    s = sdf_net.sdf_only(params["sdf_network"], static["sdf"], pseudo_pts, stages)
    return s * m[:, None].astype(s.dtype)
