"""Full-protocol training via host-orchestrated per-stage VJPs.

The reference trains the whole 4-stage cascade + renderer + losses under one
torch autograd graph (runner.py:115-196).  A single monolithic XLA graph of
the same program at the full 88^3->704^3 protocol overwhelms the compiler
(round-1 finding), so this module decomposes the train step the same way
validation decomposes the forward: one jitted graph per cascade stage, plus
a render+loss head and the feature extractor — and stitches the BACKWARD
across the stage boundaries by hand.

Decomposition (all pieces individually jitted, compiled once per process):

    features        = feat(fn_params, imgs)
    carry_{s+1}, out_s, reg_s = stage_s(params, ipts, features, carry_s)
    loss            = head(is_params, storages, depth_outs, features, ...)

Gradient stitching (exact chain rule — equivalent to monolithic autodiff up
to float reassociation):

    head  -> d(is_params), d(storage_s), d(depth_outs_s), d(features)
    stage_s (reverse order, recomputing its forward inside the bwd graph =
    stage-granular rematerialization)
          -> d(params), d(carry diff parts of stage s-1), d(features)
    feat  -> d(fn_params) from the accumulated feature cotangent

The carry's differentiable leaves are (mid, depths, matching_volume); the
VoxelGrid structure is integer/bool and flows outside the VJPs.  Cotangents
for a stage's outputs come from two places — the head (storage / depth /
occ_reg) and the next stage's carry cotangent — and are combined by passing
both into one jax.vjp call per stage.

Reference semantics preserved: loss terms per models/losses/loss.py:32-77,
stage flow per models/surf.py:80-131.
"""

from __future__ import annotations

import functools
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

from . import feature_net, implicit_surface, surf
from ..losses import compute_loss


@jax.jit
def _zeros_like_tree(tree):
    # jitted: under multi-host meshes the carry trees are globally-sharded
    # arrays, which eager ops cannot touch
    return jax.tree.map(jnp.zeros_like, tree)


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


# jitted accumulate with the LEFT operand donated: gradient/cotangent trees
# never exist twice during the backward stage loop, which runs near full
# HBM occupancy at the 704^3 protocol
@partial(jax.jit, donate_argnums=(0,))
def _tree_add_into(a, b):
    return jax.tree.map(jnp.add, a, b)


# ---------------------------------------------------------------------------
# jitted pieces (cached per frozen static / stage index)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _feat_fns():
    @jax.jit
    def fwd(fn_params, imgs):
        return feature_net.apply(fn_params, imgs)

    @jax.jit
    def bwd(fn_params, imgs, cot_features):
        _, vjp = jax.vjp(lambda p: feature_net.apply(p, imgs), fn_params)
        return vjp(list(cot_features))[0]

    return fwd, bwd


@functools.lru_cache(maxsize=64)
def _stage_fns(frozen_static, s, perturb, last=False):
    static = surf._thaw(frozen_static)

    @jax.jit
    def fwd(params, reg_state_s, ipts, features, key_s, grid_in, rest_in):
        carry = (grid_in, *(rest_in or (None, None, None)))
        (grid, mid, depths, mv), stage_out, reg_s, sel = surf._stage_step(
            params, reg_state_s, static, ipts, features, key_s, carry,
            s=s, perturb=perturb, training=True)
        return grid, (mid, depths, mv), stage_out, reg_s, sel

    # donate every consumed buffer (the stage grid/sel, the saved carry, both
    # cotangent trees): the backward loop runs at full HBM occupancy and the
    # orchestrator never touches these arguments again
    @partial(jax.jit,
             donate_argnums=(5, 6, 7, 8) if last else (5, 6, 7, 8, 9))
    def bwd(params, reg_state_s, ipts, features, key_s, grid_s, sel_s,
            rest_in, *cots):
        """Recompute the DIFFERENTIABLE stage body (given the forward's
        output grid + compaction indices — the depth-filter geometry is
        never re-run) and pull the cotangents back to (d params, d rest_in,
        d features).  rest_in of stage 0 is all-None (no differentiable
        carry).  With ``last``, the stage's own carry outputs (mid, depths,
        matching volume) feed nothing differentiable downstream, so their
        cotangent is identically zero: the bwd graph neither takes the
        ~0.8 GB zero tree as an input nor differentiates those outputs at
        all (the step-1 OOM headroom fix, VERDICT r4 #2)."""
        has_carry = rest_in is not None and rest_in[0] is not None
        if last:
            (cot_stage_out,) = cots
        else:
            cot_rest_out, cot_stage_out = cots

        if has_carry:
            def f(p, feats, rest):
                mid_prev, depths_prev, matching_prev = rest
                (g, mid, depths, mv), stage_out, _ = surf._stage_compute(
                    p, reg_state_s, static, ipts, feats, key_s, grid_s,
                    sel_s, mid_prev, depths_prev, matching_prev,
                    s=s, perturb=perturb, training=True)
                return stage_out if last else ((mid, depths, mv), stage_out)

            _, vjp = jax.vjp(f, params, features, rest_in)
            g_params, g_feats, g_rest = vjp(
                cot_stage_out if last else (cot_rest_out, cot_stage_out))
        else:
            def f0(p, feats):
                (g, mid, depths, mv), stage_out, _ = surf._stage_compute(
                    p, reg_state_s, static, ipts, feats, key_s, grid_s,
                    None, None, None, None,
                    s=s, perturb=perturb, training=True)
                return stage_out if last else ((mid, depths, mv), stage_out)

            _, vjp = jax.vjp(f0, params, features)
            g_params, g_feats = vjp(
                cot_stage_out if last else (cot_rest_out, cot_stage_out))
            g_rest = None
        return g_params, g_feats, g_rest

    return fwd, bwd


def _head_scene(static, loss_cfg, p_is, storages, depth_outs, features, grids,
                matching_volume, match_features, ipts, key_render, step_f,
                anneal):
    """Per-scene render + loss head.  storages / grids coarse-first."""
    stages_ff = list(zip(grids, storages))[::-1]
    fine_first = list(features)[::-1]
    match_ff = [jax.lax.stop_gradient(f) for f in match_features][::-1]

    outputs = dict(depth_outs)
    render_out = implicit_surface.render(
        key_render, p_is, static["implicit_surface"],
        ipts["rays_o"], ipts["rays_d"], ipts["near"], ipts["far"],
        matching_volume, stages_ff, fine_first, match_ff,
        ipts["imgs"], ipts["intrs"], ipts["c2ws"], anneal, step_f)
    outputs.update(render_out)
    if "pseudo_pts" in ipts:
        outputs["pseudo_sdf"] = implicit_surface.pseudo_sdf(
            p_is, static["implicit_surface"], ipts["pseudo_pts"],
            stages_ff)
    res = compute_loss(loss_cfg, outputs, ipts, step_f, "train")
    res["psnr"] = 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.mean(
        (outputs["color_fine"] - ipts["color"]) ** 2) + 1e-12))
    return res["loss"], res


@functools.lru_cache(maxsize=8)
def _head_fns(frozen_static, frozen_loss_cfg):
    static = surf._thaw(frozen_static)
    loss_cfg = surf._thaw(frozen_loss_cfg)

    def head(p_is, storages, depth_outs, features, grids, matching_volume,
             match_features, ipts, key_render, step_f, anneal):
        return _head_scene(static, loss_cfg, p_is, storages, depth_outs,
                           features, grids, matching_volume, match_features,
                           ipts, key_render, step_f, anneal)

    # storages / depth_outs / matching_volume / match_features are consumed
    # by the head alone (the stage backwards recompute their own): donating
    # them frees ~1 GB at protocol scale before the backward loop starts
    @partial(jax.jit, donate_argnums=(1, 2, 5, 6))
    def fwd_bwd(p_is, storages, depth_outs, features, grids, matching_volume,
                match_features, ipts, key_render, step_f, anneal):
        grad_fn = jax.value_and_grad(head, argnums=(0, 1, 2, 3), has_aux=True)
        (loss, res), (g_is, g_storages, g_depth_outs, g_feats) = grad_fn(
            p_is, storages, depth_outs, features, grids, matching_volume,
            match_features, ipts, key_render, step_f, anneal)
        return loss, res, g_is, g_storages, g_depth_outs, g_feats

    return fwd_bwd


# ---------------------------------------------------------------------------
# multi-chip: scene-data-parallel variants of the per-stage graphs
#
# The reference trains DDP over scenes (runner.py:102, scripts/run.sh).  The
# staged path cannot wrap a host loop in one vmapped jit, so instead every
# per-stage graph is shard_map-ped over a ``data`` mesh axis: batches carry a
# leading scene axis (one scene per device), params stay replicated, and the
# only communication is the psum of parameter gradients / metrics — the same
# ICI all-reduce pattern as the monolithic DP step (parallel/mesh.py).
# Zero-weight scenes (ragged-epoch padding) scale their loss to zero.
# ---------------------------------------------------------------------------

from jax import shard_map
from jax.sharding import PartitionSpec as P

_AX = "data"


def _wmean_tree(tree, weights, wsum):
    def wm(x):
        w = weights.reshape((-1,) + (1,) * (x.ndim - 1))
        return jax.lax.psum(jnp.sum(x * w, axis=0), _AX) / wsum
    return jax.tree.map(wm, tree)


def _sum_scenes_tree(tree):
    """Sum per-scene gradient stacks over the LOCAL scene axis only.

    No explicit psum: under shard_map's varying-axes semantics, the vjp
    w.r.t. a REPLICATED (P()) input already inserts the cross-device psum —
    the per-device value is the global sum (verified: an extra psum
    multiplies gradients by the device count while leaving losses correct).
    """
    return jax.tree.map(lambda x: jnp.sum(x, axis=0), tree)


@functools.lru_cache(maxsize=8)
def _feat_fns_dp(mesh):
    def fwd_local(fn_params, imgs):
        return jax.vmap(lambda im: feature_net.apply(fn_params, im))(imgs)

    fwd = jax.jit(shard_map(fwd_local, mesh=mesh,
                            in_specs=(P(), P(_AX)), out_specs=P(_AX)))

    def bwd_local(fn_params, imgs, cot):
        _, vjp = jax.vjp(
            lambda p: jax.vmap(lambda im: feature_net.apply(p, im))(imgs),
            fn_params)
        # fn_params is replicated (P()): the vjp's implicit psum already
        # made this the global cross-device sum (see _sum_scenes_tree)
        return vjp(list(cot))[0]

    bwd = jax.jit(shard_map(bwd_local, mesh=mesh,
                            in_specs=(P(), P(_AX), P(_AX)), out_specs=P()))
    return fwd, bwd


@functools.lru_cache(maxsize=64)
def _stage_fns_dp(frozen_static, s, perturb, mesh, last=False):
    static = surf._thaw(frozen_static)

    def fwd_local(params, reg_state_s, ipts, features, keys, grid_in, rest_in,
                  weights):
        def per_scene(ipts_i, feats_i, key_i, grid_i, rest_i):
            carry = (grid_i, *(rest_i if rest_i is not None
                               else (None, None, None)))
            (grid, mid, depths, mv), stage_out, reg_s, sel = surf._stage_step(
                params, reg_state_s, static, ipts_i, feats_i, key_i, carry,
                s=s, perturb=perturb, training=True)
            return grid, (mid, depths, mv), stage_out, reg_s, sel

        if s == 0:
            grid, rest, stage_out, reg_s, sel = jax.vmap(
                lambda a, b, c: per_scene(a, b, c, None, None)
            )(ipts, features, keys)
        else:
            grid, rest, stage_out, reg_s, sel = jax.vmap(per_scene)(
                ipts, features, keys, grid_in, rest_in)
        wsum = jax.lax.psum(jnp.sum(weights), _AX)
        # BN running stats weight-averaged over scenes (the DDP analogue of
        # shared batch statistics)
        reg_s = _wmean_tree(reg_s, weights, wsum)
        return grid, rest, stage_out, reg_s, sel

    in_sp = (P(), P(), P(_AX), P(_AX), P(_AX), P(_AX), P(_AX), P(_AX))
    fwd = jax.jit(shard_map(fwd_local, mesh=mesh, in_specs=in_sp,
                            out_specs=(P(_AX), P(_AX), P(_AX), P(), P(_AX))))

    def bwd_local(params, reg_state_s, ipts, features, keys, grid_s, sel_s,
                  rest_in, *cots):
        has_carry = rest_in is not None and rest_in[0] is not None
        if last:
            (cot_stage_out,) = cots
            cot_rest_out = None   # never read: the last-stage vjp pulls
            # back only stage_out (its carry feeds nothing differentiable)
        else:
            cot_rest_out, cot_stage_out = cots

        def per_scene(ipts_i, feats_i, key_i, grid_i, sel_i, rest_i,
                      ct_rest_i, ct_so_i):
            if has_carry:
                def f(p, fe, rest):
                    mid_prev, depths_prev, matching_prev = rest
                    (g, mid, depths, mv), so, _ = surf._stage_compute(
                        p, reg_state_s, static, ipts_i, fe, key_i, grid_i,
                        sel_i, mid_prev, depths_prev, matching_prev,
                        s=s, perturb=perturb, training=True)
                    return so if last else ((mid, depths, mv), so)

                _, vjp = jax.vjp(f, params, feats_i, rest_i)
                gp, gf, gr = vjp(ct_so_i if last else (ct_rest_i, ct_so_i))
            else:
                def f0(p, fe):
                    (g, mid, depths, mv), so, _ = surf._stage_compute(
                        p, reg_state_s, static, ipts_i, fe, key_i, grid_i,
                        None, None, None, None,
                        s=s, perturb=perturb, training=True)
                    return so if last else ((mid, depths, mv), so)

                _, vjp = jax.vjp(f0, params, feats_i)
                gp, gf = vjp(ct_so_i if last else (ct_rest_i, ct_so_i))
                gr = None
            return gp, gf, gr

        if last:
            def per_scene_last(ipts_i, feats_i, key_i, grid_i, sel_i,
                               rest_i, ct_so_i):
                return per_scene(ipts_i, feats_i, key_i, grid_i, sel_i,
                                 rest_i, None, ct_so_i)

            g_params, g_feats, g_rest = jax.vmap(per_scene_last)(
                ipts, features, keys, grid_s, sel_s, rest_in, cot_stage_out)
        else:
            g_params, g_feats, g_rest = jax.vmap(per_scene)(
                ipts, features, keys, grid_s, sel_s, rest_in, cot_rest_out,
                cot_stage_out)
        g_params = _sum_scenes_tree(g_params)
        return g_params, g_feats, g_rest

    n_in = 9 if last else 10
    in_sp_b = (P(), P()) + (P(_AX),) * (n_in - 2)
    bwd = jax.jit(shard_map(bwd_local, mesh=mesh, in_specs=in_sp_b,
                            out_specs=(P(), P(_AX), P(_AX))),
                  donate_argnums=(5, 6, 7, 8) if last else (5, 6, 7, 8, 9))
    return fwd, bwd


@functools.lru_cache(maxsize=8)
def _head_fns_dp(frozen_static, frozen_loss_cfg, mesh):
    static = surf._thaw(frozen_static)
    loss_cfg = surf._thaw(frozen_loss_cfg)

    def local(p_is, storages, depth_outs, features, grids, matching_volume,
              match_features, ipts, keys, weights, step_f, anneal):
        wsum = jax.lax.psum(jnp.sum(weights), _AX)

        def per_scene(sto, dout, feats, grds, mv, mfeats, ipts_i, key_i, w_i):
            def f(p_is_, sto_, dout_, feats_):
                loss, res = _head_scene(static, loss_cfg, p_is_, sto_, dout_,
                                        feats_, grds, mv, mfeats, ipts_i,
                                        key_i, step_f, anneal)
                # scene weight folded into the loss: every cotangent flowing
                # back through the stages carries the 1/sum(w) scaling, so
                # the final grads are the weighted scene mean after psum
                return loss * (w_i / wsum), res

            grad_fn = jax.value_and_grad(f, argnums=(0, 1, 2, 3),
                                         has_aux=True)
            (loss_w, res), (g_is, g_sto, g_dout, g_feats) = grad_fn(
                p_is, sto, dout, feats)
            return loss_w, res, g_is, g_sto, g_dout, g_feats

        loss_w, res, g_is, g_sto, g_dout, g_feats = jax.vmap(per_scene)(
            storages, depth_outs, features, grids, matching_volume,
            match_features, ipts, keys, weights)
        loss = jax.lax.psum(jnp.sum(loss_w), _AX)
        res = _wmean_tree(res, weights, wsum)
        g_is = _sum_scenes_tree(g_is)
        return loss, res, g_is, g_sto, g_dout, g_feats

    in_sp = (P(), P(_AX), P(_AX), P(_AX), P(_AX), P(_AX), P(_AX), P(_AX),
             P(_AX), P(_AX), P(), P())
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=in_sp,
        out_specs=(P(), P(), P(), P(_AX), P(_AX), P(_AX))),
        donate_argnums=(1, 2, 5, 6))


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def value_and_grad_staged(params, state, static, loss_cfg, batch, key,
                          step_f, anneal, *, perturb=True, mesh=None,
                          weights=None):
    """Full train-step value+grad with per-stage graphs.

    Returns (res, grads, new_state) — the same quantities the monolithic
    ``jax.value_and_grad`` path produces, computed without ever building the
    whole cascade into one XLA graph.

    With ``mesh`` the batch carries a leading scene axis sharded over the
    mesh's ``data`` axis (one scene per device) and every per-stage graph is
    shard_map-ped; ``weights`` (n_scenes,) zero-masks ragged-epoch padding.
    """
    num_stage = static["num_stage"]
    frozen_static = surf._freeze(static)
    frozen_loss = surf._freeze(loss_cfg)
    dp = mesh is not None
    prof = os.environ.get("SURF_STAGED_PROFILE", "0") != "0"
    # Serialize graph DISPATCH within the step (default on).  PJRT
    # allocates a computation's output buffers at dispatch; enqueueing all
    # ~2+2*num_stage graphs back-to-back makes every graph's outputs (and
    # every donated-but-not-yet-consumed input) resident at once.  Step 0
    # never sees this — its first execution of each graph compiles inline,
    # which serializes dispatch naturally — so the failure signature is
    # "step 0 fine, step 1 RESOURCE_EXHAUSTED" at the 704^3 protocol
    # (r4 + three r5 repros; a profiled run, whose per-graph timing sync
    # serializes dispatch the same way, completes at 34.3 s/step with the
    # per-graph sums equal to the step time — the pipelining this gives up
    # was never there to win).
    serialize = prof or os.environ.get("SURF_STAGED_SERIALIZE", "1") != "0"

    def tick(label, out):
        if serialize and not prof:
            jax.block_until_ready(out)
        if prof:
            jax.block_until_ready(out)
            t = time.time()
            dt = t - tick.t0
            tick.t0 = t
            ms = jax.local_devices()[0].memory_stats() or {}
            gib = 2.0 ** 30
            print(f"  [staged] {label:>12s}: {dt:7.2f} s"
                  f"  in_use={ms.get('bytes_in_use', 0) / gib:5.2f}"
                  f" peak={ms.get('peak_bytes_in_use', 0) / gib:5.2f} GiB",
                  flush=True)
        return out
    tick.t0 = time.time()

    if dp:
        n = batch["imgs"].shape[0]
        if weights is None:
            weights = jnp.ones((n,), jnp.float32)
        # per-scene independent randomness (the reference's per-rank streams),
        # derived so scene i's stream equals a single-device run with
        # split(key, n)[i] — keeps DP bit-comparable to per-scene runs
        scene_keys = jax.random.split(key, n)
        kb_kr = jax.vmap(jax.random.split)(scene_keys)    # (n, 2, 2)
        k_render = kb_kr[:, 1]
        stage_keys = jax.vmap(
            lambda kb: jax.random.split(kb, num_stage))(kb_kr[:, 0])
        keys = [stage_keys[:, s] for s in range(num_stage)]
        feat_fwd, feat_bwd = _feat_fns_dp(mesh)
    else:
        k_build, k_render = jax.random.split(key)
        keys = jax.random.split(k_build, num_stage)
        feat_fwd, feat_bwd = _feat_fns()

    features = feat_fwd(params["feature_network"], batch["imgs"])
    match_features = feat_fwd(state["match_feature_network"], batch["imgs"])

    # ---- forward through the cascade, saving stage inputs ----
    rests_in = []
    grid, rest = None, None
    stage_outs, grids, sels, new_reg_state = [], [], [], []
    for s in range(num_stage):
        rests_in.append(rest)
        if dp:
            fwd, _ = _stage_fns_dp(frozen_static, s, perturb, mesh)
            grid, rest, stage_out, reg_s, sel = fwd(
                params, state["reg_network"][s], batch, features, keys[s],
                grid, rest, weights)
        else:
            fwd, _ = _stage_fns(frozen_static, s, perturb)
            grid, rest, stage_out, reg_s, sel = fwd(
                params, state["reg_network"][s], batch, features, keys[s],
                grid, rest)
        tick(f"fwd stage {s}", rest)
        grids.append(grid)
        sels.append(sel)
        stage_outs.append(stage_out)
        new_reg_state.append(reg_s)
    matching_volume = rest[2]

    # ---- render + loss head ----
    storages = [so["storage"] for so in stage_outs]
    depth_outs = {}
    for s in range(num_stage):
        depth_outs[f"depth_stage{s}"] = stage_outs[s]["depth"]
        depth_outs[f"depth_src_stage{s}"] = stage_outs[s]["depth_src"]
        depth_outs[f"occ_reg_stage{s}"] = stage_outs[s]["occ_reg"]

    if dp:
        head = _head_fns_dp(frozen_static, frozen_loss, mesh)
        loss, res, g_is, g_storages, g_depth_outs, g_feats = head(
            params["implicit_surface"], storages, depth_outs, features,
            grids, matching_volume, match_features, batch, k_render, weights,
            jnp.float32(step_f), jnp.float32(anneal))
    else:
        head = _head_fns(frozen_static, frozen_loss)
        loss, res, g_is, g_storages, g_depth_outs, g_feats = head(
            params["implicit_surface"], storages, depth_outs, features,
            grids, matching_volume, match_features, batch, k_render,
            jnp.float32(step_f), jnp.float32(anneal))
    tick("head", loss)

    # ---- backward through the cascade ----
    grads = _zeros_like_tree(params)
    grads["implicit_surface"] = g_is
    cot_features = list(g_feats)
    # the final carry (mid, depths, matching_volume) is consumed by nothing
    # differentiable downstream (z-val surface localization stops
    # gradients): the LAST stage's bwd graph takes no carry cotangent at
    # all instead of a materialized ~0.8 GB zero tree (step-1 OOM headroom)
    cot_rest = None

    # free forward products the backward no longer needs: the stage loop
    # runs near full HBM occupancy at the 704^3 protocol.  storages /
    # depth_outs / matching_volume / match_features were DONATED to the
    # head graph above (their buffers are already freed on device).
    del rest, stage_outs, depth_outs, g_feats, matching_volume
    del match_features, storages

    for s in reversed(range(num_stage)):
        last = s == num_stage - 1
        cot_stage_out = {
            "storage": g_storages[s],
            "depth": g_depth_outs.pop(f"depth_stage{s}"),
            "depth_src": g_depth_outs.pop(f"depth_src_stage{s}"),
            "occ_reg": g_depth_outs.pop(f"occ_reg_stage{s}"),
        }
        g_storages[s] = None
        if dp:
            _, bwd = _stage_fns_dp(frozen_static, s, perturb, mesh,
                                   last=last)
        else:
            _, bwd = _stage_fns(frozen_static, s, perturb, last=last)
        cots = (cot_stage_out,) if last else (cot_rest, cot_stage_out)
        g_params_s, g_feats_s, cot_rest = bwd(
            params, state["reg_network"][s], batch, features, keys[s],
            grids[s], sels[s], rests_in[s], *cots)
        tick(f"bwd stage {s}", cot_rest if cot_rest is not None else g_params_s)
        # drop this stage's saved inputs before the next (coarser) bwd
        grids[s] = None
        sels[s] = None
        rests_in[s] = None
        grads = _tree_add_into(grads, g_params_s)
        del g_params_s
        cot_features = _tree_add_into(cot_features, list(g_feats_s))

    grads["feature_network"] = _tree_add(
        grads["feature_network"],
        feat_bwd(params["feature_network"], batch["imgs"],
                 list(cot_features)))

    new_state = {"reg_network": new_reg_state,
                 "match_feature_network": state["match_feature_network"]}
    return res, grads, new_state


def make_staged_train_step(optimizer, static, loss_cfg, mesh=None):
    """Train step mirroring runner._train_step_fn's contract but with the
    staged value+grad and a separately-jitted optimizer update.  With
    ``mesh``, batches carry a leading scene axis sharded over ``data``."""

    import optax

    # params / grads / opt_state are all consumed (the orchestrator rebinds
    # params and opt_state to the outputs): donating aliases the update
    # in-place instead of holding two copies across the step boundary
    @partial(jax.jit, donate_argnums=(1, 2))
    def opt_step(params, grads, opt_state):
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    def step(params, state, opt_state, batch, key, step_f, anneal,
             weights=None):
        res, grads, new_state = value_and_grad_staged(
            params, state, static, loss_cfg, batch, key, step_f, anneal,
            mesh=mesh, weights=weights)
        new_params, new_opt = opt_step(params, grads, opt_state)
        return new_params, new_state, new_opt, res

    return step
