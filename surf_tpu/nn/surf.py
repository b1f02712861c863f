"""SuRF composite model: FPN features -> sparse volume cascade -> NeuS
render.  Functional re-design of models/surf.py:15-163.

``build_volumes`` runs the cascade (surf.py:80-131): per stage it
(1) upsamples + depth-filters the voxel set (stage 0 = the dense base grid),
(2) back-projects multi-scale features with attention aggregation,
(3) regularizes with the sparse U-Net,
(4) scatters channel 0 into the dense matching volume (seeded by the
    upsampled previous one) and keeps channels 1: as the sparse feature
    volume,
(5) renders per-view matching-field depths that drive the next stage's
    sparsification.

The frozen ``match_feature_network`` copy (surf.py:30-32, 141-148) is
realized functionally: the training loop snapshots the feature-network
params into the model state on even steps and the forward pass runs them
under stop_gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import feature_net, reg_net, matching_field, implicit_surface, volume as volume_mod
from ..ops import sparse as sp


def init(key, conf):
    """Returns (params, state, static)."""
    range_ratios = conf.get_list("range_ratios")
    num_stage = len(range_ratios)

    # All array construction under ONE jit: eagerly, the geometric/weight-
    # norm inits dispatch ~120 separate op compiles (~80 s/process, worse
    # over the axon tunnel); jitted it is one compile that also lands in
    # the persistent compilation cache.  The per-module statics are plain
    # conf-derived Python, captured from the (always-executed) trace.
    static_box = {}

    def _arrays(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        fn_params = feature_net.init(k1, conf["feature_network"])
        vol_params = volume_mod.init(k2, conf["volume"])
        reg_params, reg_state = reg_net.init_list(k3, conf["reg_network"])
        is_params, is_static = implicit_surface.init(
            k4, conf["implicit_surface"])
        static_box["implicit_surface"] = is_static
        params = {
            "feature_network": fn_params,
            "volume": vol_params,
            "reg_network": reg_params,
            "implicit_surface": is_params,
        }
        # strip weak types (leaves built from Python scalars, e.g.
        # jnp.full): after the first optimizer update they turn strong and
        # every graph that takes params retraces once — ~20 min of
        # recompiles at the full protocol on the remote-compile backend
        params = jax.tree.map(
            lambda x: jax.lax.convert_element_type(x, x.dtype), params)
        state = {
            "reg_network": reg_state,
            # frozen copy of the feature network, refreshed on even steps
            "match_feature_network": jax.tree.map(jnp.copy, fn_params),
        }
        return params, state

    params, state = jax.jit(_arrays)(key)
    is_static = static_box["implicit_surface"]

    base_dim = conf.get_list("volume.base_volume_dim")[0]
    default_caps = [(base_dim // 2) ** 3] + [(base_dim // 2) ** 3] * (num_stage - 1)
    parent_caps = conf.get_list("volume.stage_parent_capacity", default=None)
    if parent_caps is None:
        # stage_capacity (children) accepted for convenience
        child_caps = conf.get_list("volume.stage_capacity", default=None)
        parent_caps = [c // 8 for c in child_caps] if child_caps else default_caps
    parent_caps[0] = (base_dim // 2) ** 3  # stage 0 is the dense base grid

    static = {
        "range_ratios": range_ratios,
        "num_stage": num_stage,
        "base_dim": base_dim,
        "parent_caps": parent_caps,
        "dense_unet_max_res": conf.get_int("dense_unet_max_res", default=176),
        # dtype of the dense matching (density) volumes: at 704^3 the fp32
        # volume + its 2x-upsampled successor dominate HBM; bfloat16 halves
        # them (density feeds a softmax — ~3 significant digits suffice)
        "matching_dtype": conf.get_string("volume.matching_dtype",
                                          default="float32"),
        "remat_stages": conf.get_bool("remat_stages", default=True),
        "matching_field": {
            "n_samples_depths": conf.get_list("matching_field.n_samples_depths"),
            "depth_res_levels": conf.get_list("matching_field.depth_res_levels"),
        },
        "implicit_surface": is_static,
    }
    return params, state, static


def _stage_compute(params, reg_state_s, static, ipts, features, key_s,
                   grid, sel, mid_prev, depths_prev, matching_prev,
                   *, s, perturb, training):
    """The DIFFERENTIABLE body of a cascade stage, given its (integer)
    voxel geometry: frustum masking, feature back-projection, the sparse
    U-Net, the dense matching volume and the matching-field depths.

    ``grid`` may be pre- or post-frustum-masked (the frustum intersection is
    idempotent), so the staged backward can feed the forward's output grid
    back in and skip the depth-filter geometry entirely.
    """
    intrs = ipts["intrs"]
    c2ws = ipts["c2ws"]
    hw = ipts["imgs"].shape[1:3]

    world = sp.voxel_centers_world(grid.child_coords(), grid.res)
    bp_feats, frustum = volume_mod.back_project(
        params["volume"], features, world, intrs, c2ws, s, hw)
    cvalid = grid.cvalid & frustum
    grid = grid._replace(cvalid=cvalid)
    bp_feats = bp_feats * cvalid[:, None].astype(bp_feats.dtype)
    if sel is None:
        feats = bp_feats
    else:
        up_feats = volume_mod.upsample_feats(mid_prev, sel, cvalid)
        feats = jnp.concatenate([bp_feats, up_feats], axis=-1)

    out, mid, reg_s = reg_net.apply(
        params["reg_network"][s], reg_state_s, grid, feats,
        training=training, dense_max_res=static["dense_unet_max_res"])

    mdtype = jnp.dtype(static.get("matching_dtype", "float32"))
    matching_volume = volume_mod.matching_and_mask_volume(
        grid, out[:, :1].astype(mdtype), matching_prev)

    # the LAST stage's depth maps feed no further filtering — only the
    # ref/src views (the gradient views) are consumed by the loss, so the
    # remaining views' renders are skipped outright
    last = s == static["num_stage"] - 1
    depths, occ_regs = matching_field.apply(
        key_s, static["matching_field"], ipts, matching_volume, s,
        static["range_ratios"], None if s == 0 else depths_prev,
        perturb=perturb, grad_views_only=last)

    src_idx = ipts.get("src_idx", None)
    depth_src = depths[0] if src_idx is None else \
        jnp.take(depths, jnp.asarray(src_idx), axis=0)
    stage_out = {"storage": out[:, 1:], "depth": depths[0],
                 "depth_src": depth_src, "occ_reg": occ_regs}
    return (grid, mid, depths, matching_volume), stage_out, reg_s


def _stage_step(params, reg_state_s, static, ipts, features, key_s, carry,
                *, s, perturb, training):
    """One cascade stage.  carry = (grid, mid, depths, matching_volume); all
    None at s=0.  Kept as a standalone function so orchestration can jit
    stages independently (one 704^3-scale graph per stage compiles where a
    monolithic 4-stage graph overwhelms the compiler).

    Returns (carry, stage_out, reg_s, sel) — ``sel`` (with the carry's grid)
    lets the staged backward jit skip the non-differentiable depth-filter
    geometry (surf_tpu/nn/train_staged.py)."""
    intrs = ipts["intrs"]
    c2ws = ipts["c2ws"]
    near, far = ipts["near"].reshape(-1)[0], ipts["far"].reshape(-1)[0]
    base_range = far - near
    grid_prev, mid_prev, depths_prev, matching_prev = carry

    stage_range = base_range * static["range_ratios"][s]
    if s == 0:
        grid = sp.dense_base_grid(static["base_dim"])
        sel = None
    else:
        grid, sel = volume_mod.upsample_filter_geometry(
            grid_prev, depths_prev, intrs, c2ws, stage_range,
            static["parent_caps"][s])

    carry_new, stage_out, reg_s = _stage_compute(
        params, reg_state_s, static, ipts, features, key_s, grid, sel,
        mid_prev, depths_prev, matching_prev, s=s, perturb=perturb,
        training=training)
    return carry_new, stage_out, reg_s, sel


def _freeze(obj):
    """Nested dict/list -> hashable tuples (cache key for per-stage jits)."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(obj):
    if isinstance(obj, tuple) and obj and all(
            isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str)
            for e in obj):
        return {k: _thaw(v) for k, v in obj}
    if isinstance(obj, tuple):
        return [_thaw(v) for v in obj]
    return obj


import functools


@functools.lru_cache(maxsize=64)
def _jit_stage_cached(frozen_static, s, perturb, training):
    static = _thaw(frozen_static)

    # carry split so the consumable inter-stage buffers (mid features,
    # depths, previous matching volume) can be DONATED — at full scale the
    # previous stage's volumes otherwise stay live through the next stage's
    # peak.  The grid is kept out of donation: the caller retains it in the
    # stages list.
    def fn(params, reg_state_s, ipts, features, key_s, grid, rest):
        carry = (grid, *rest)
        new_carry, stage_out, reg_s, _sel = _stage_step(
            params, reg_state_s, static, ipts, features, key_s, carry,
            s=s, perturb=perturb, training=training)
        return new_carry[0], tuple(new_carry[1:]), stage_out, reg_s

    return jax.jit(fn, donate_argnums=(6,))


def build_volumes(key, params, state, static, ipts, features, *,
                  perturb, training=False, jit_stages=False):
    """Run the sparsification cascade.

    Returns (outputs, stages, matching_volume, new_reg_state) where
    ``stages`` is a list of (VoxelGrid, feat_storage (P*8, d_out-1))
    coarse-to-fine.  With ``jit_stages`` each stage compiles as its own
    graph (for host-orchestrated validation at full scale).
    """
    from functools import partial

    outputs = {}
    stages = []
    new_reg_state = []
    carry = (None, None, None, None)

    num_stage = static["num_stage"]
    keys = jax.random.split(key, num_stage)
    for s in range(num_stage):
        if jit_stages:
            fn = _jit_stage_cached(_freeze(static), s, perturb, training)
            grid_new, rest_new, stage_out, reg_s = fn(
                params, state["reg_network"][s], ipts, features, keys[s],
                carry[0], tuple(carry[1:]))
            carry = (grid_new, *rest_new)
        else:
            def stage_fn(params_, reg_state_, ipts_, features_, key_, carry_,
                         _s=s):
                return _stage_step(params_, reg_state_, static, ipts_,
                                   features_, key_, carry_, s=_s,
                                   perturb=perturb, training=training)

            if training and static.get("remat_stages", True):
                # rematerialize each cascade stage in the backward pass:
                # keeping every stage's activations alive pushes the full
                # train step past HBM (jax.checkpoint trades ~1 extra
                # forward per stage for the win)
                stage_fn = jax.checkpoint(stage_fn)
            carry, stage_out, reg_s, _sel = stage_fn(
                params, state["reg_network"][s], ipts, features, keys[s],
                carry)
        grid = carry[0]
        stages.append((grid, stage_out["storage"]))
        new_reg_state.append(reg_s)
        outputs[f"depth_stage{s}"] = stage_out["depth"]
        outputs[f"depth_src_stage{s}"] = stage_out["depth_src"]
        outputs[f"occ_reg_stage{s}"] = stage_out["occ_reg"]

    matching_volume = carry[3]
    return outputs, stages, matching_volume, {"reg_network": new_reg_state}


def forward(key, params, state, static, mode, ipts, cos_anneal_ratio=1.0,
            step=None, *, training=None, perturb=None):
    """Training / finetune-style forward over sampled rays.

    Validation (mesh extraction + full-image render) lives in the runner —
    it is host-orchestrated chunked work, not a single jit graph.
    ``perturb`` overrides the mode-derived z-val jitter (reference
    build_volumes perturb=(mode=="train"), surf.py:139) — parity tests
    disable it to compare against the torch reference deterministically.
    """
    if training is None:
        training = mode == "train"
    if perturb is None:
        perturb = mode == "train"
    k_build, k_render = jax.random.split(key)

    features = feature_net.apply(params["feature_network"], ipts["imgs"])
    outputs, stages, matching_volume, new_state = build_volumes(
        k_build, params, state, static, ipts, features,
        perturb=perturb, training=training)

    match_features = [
        jax.lax.stop_gradient(f) for f in
        feature_net.apply(state["match_feature_network"], ipts["imgs"])]

    fine_first = features[::-1]
    match_fine_first = match_features[::-1]
    stages_fine_first = stages[::-1]

    render_out = implicit_surface.render(
        k_render, params["implicit_surface"], static["implicit_surface"],
        ipts["rays_o"], ipts["rays_d"], ipts["near"], ipts["far"],
        matching_volume, stages_fine_first, fine_first, match_fine_first,
        ipts["imgs"], ipts["intrs"], ipts["c2ws"], cos_anneal_ratio, step)
    outputs.update(render_out)

    if "pseudo_pts" in ipts:
        outputs["pseudo_sdf"] = implicit_surface.pseudo_sdf(
            params["implicit_surface"], static["implicit_surface"],
            ipts["pseudo_pts"], stages_fine_first)

    new_state = dict(new_state)
    new_state["match_feature_network"] = state["match_feature_network"]
    return outputs, new_state


def refresh_match_features(params, state):
    """Snapshot the live feature network into the frozen copy — the even-step
    refresh at surf.py:141-148 (called from the training loop)."""
    new_state = dict(state)
    new_state["match_feature_network"] = jax.tree.map(
        jnp.copy, params["feature_network"])
    return new_state
