"""Piece-level fwd/bwd timing of a cascade stage at protocol scale.

The staged train step spends 61% of its 140 s in the backward of stages
2-3 (STATUS.md round-2 breakdown).  This tool attributes that time to the
stage's sub-components — upsample/depth-filter, back-projection, the
sparse U-Net, the dense matching volume, and the matching field — by
timing each piece's jitted forward AND a jitted value+vjp (random
cotangents) on synthesized stage-scale state, without paying the
full-cascade compile.

Usage: PROF_STAGE=3 python tools/profile_stage.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from profile_components import synth_grid  # noqa: E402
from surf_tpu.config import ConfigFactory  # noqa: E402
from surf_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from surf_tpu.nn import feature_net, matching_field, reg_net, volume as volume_mod  # noqa: E402
from surf_tpu.ops import sparse as sp  # noqa: E402


def bench(label, fn, *args, iters=3):
    t_c = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t_c
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"  {label:>28s}: {dt:8.3f} s   (first incl. compile {t_compile:6.1f} s)",
          flush=True)
    return dt


def main():
    # PROF_ONLY: comma-separated subset of {upsample,backproj,reg,mvol,mfield}
    # so each piece can run in its own short-lived process (clean exits
    # release the tunnel device; killed long runs wedge it)
    only = set(os.environ.get("PROF_ONLY", "").split(",")) - {""}

    def want(name):
        return not only or name in only

    s = int(os.environ.get("PROF_STAGE", 3))
    base_dim = 88
    img_hw = (480, 640)
    caps = [(base_dim // 2) ** 3, (base_dim // 2) ** 3, 262144, 393216]
    ratios = [1.0, 0.4, 0.1, 0.01]
    mf_samples = [128, 64, 32, 16]
    res_levels = [4, 2, 2, 1]
    res = base_dim * 2 ** s
    d_in = 8 if s == 0 else 16

    conf = ConfigFactory.parse_string(f"""
    ds {{
        num_src_view = 4
        img_hw = [{img_hw[0]}, {img_hw[1]}]
        n_rays = 512
        n_scenes = 1
        n_views_total = 6
    }}
    feature_network {{ d_in = 3  d_base = 8  d_out = [4, 4, 4, 4] }}
    reg {{ d_in = [8, 16, 16, 16]  d_base = [8, 8, 8, 8]  d_out = [8, 8, 8, 8] }}
    """)

    rng = np.random.default_rng(0)
    ds = SyntheticDataset(conf["ds"], "train")
    batch = {k: jnp.asarray(v) for k, v in ds[0].items() if not isinstance(v, str)}
    nv = batch["imgs"].shape[0]

    fn_params = feature_net.init(jax.random.PRNGKey(0), conf["feature_network"])
    features = jax.jit(feature_net.apply)(fn_params, batch["imgs"])
    vol_params = volume_mod.init(jax.random.PRNGKey(1), {})
    reg_params, reg_state = reg_net.init_list(jax.random.PRNGKey(2), conf["reg"])

    print(f"# device={jax.devices()[0].device_kind} stage={s} res={res} "
          f"parents={caps[s]} children={caps[s]*8}", flush=True)

    grid = synth_grid(rng, res, caps[s], dense=(s == 0))
    n_child = grid.capacity
    feats = jax.random.normal(jax.random.PRNGKey(3), (n_child, d_in)) * 0.1
    near = float(batch["near"].reshape(-1)[0])
    far = float(batch["far"].reshape(-1)[0])
    stage_range = (far - near) * ratios[s]
    depths = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(4), (nv, *img_hw)) * 0.05
        + 0.5 * (near + far), near, far)
    matching_volume = (jax.random.normal(
        jax.random.PRNGKey(5), (res, res, res, 1)) * 0.1).astype(jnp.bfloat16)
    prev_res = res // 2
    prev_matching = (jax.random.normal(
        jax.random.PRNGKey(6), (prev_res, prev_res, prev_res, 1)) * 0.1
    ).astype(jnp.bfloat16)
    jax.block_until_ready((grid, feats, matching_volume))

    world = jax.jit(lambda g: sp.voxel_centers_world(g.child_coords(), g.res))(grid)

    # ---- 1. upsample_and_filter (prev stage -> this stage) ----
    if s > 0 and want("upsample"):
        prev_grid = synth_grid(rng, res // 2, caps[s - 1], dense=(s == 1))
        prev_mid = jax.random.normal(jax.random.PRNGKey(7),
                                     (prev_grid.capacity, 8))

        @jax.jit
        def up_filter(pg, pm, d):
            return volume_mod.upsample_and_filter(
                pg, pm, d, batch["intrs"], batch["c2ws"], stage_range, caps[s])

        bench("upsample_and_filter fwd", up_filter, prev_grid, prev_mid, depths)

    # ---- 2. back_project ----
    if want("backproj"):
        @jax.jit
        def bp(p, f, w):
            return volume_mod.back_project(p, f, w, batch["intrs"],
                                           batch["c2ws"], s, img_hw)

        bench("back_project fwd", bp, vol_params, features, world)

        @jax.jit
        def bp_vjp(p, f, w, ct):
            out, vjp = jax.vjp(
                lambda p_, f_: volume_mod.back_project(
                    p_, f_, w, batch["intrs"], batch["c2ws"], s, img_hw)[0],
                p, f)
            return vjp(ct)

        ct_bp = jax.random.normal(jax.random.PRNGKey(8), (n_child, 8)) * 0.01
        bench("back_project fwd+vjp", bp_vjp, vol_params, features, world,
              ct_bp)

    # ---- 3. reg_net (sparse U-Net) ----
    # NB: grid must be an ARGUMENT — closed over, its 174 MB parent table
    # becomes an HLO constant and the executable proto fails to serialize
    if want("reg"):
        @jax.jit
        def reg(g, p, st, f):
            return reg_net.apply(p, st, g, f, training=True)[:2]

        bench("reg_net fwd", reg, grid, reg_params[s], reg_state[s], feats)

    if want("regvjp"):
        ct_out = jax.random.normal(jax.random.PRNGKey(9), (n_child, 8)) * 0.01
        ct_mid = jax.random.normal(jax.random.PRNGKey(10), (n_child, 8)) * 0.01

        @jax.jit
        def reg_vjp(g, p, st, f, co, cm):
            out, vjp = jax.vjp(
                lambda p_, f_: reg_net.apply(p_, st, g, f_,
                                             training=True)[:2],
                p, f)
            return vjp((co, cm))

        bench("reg_net fwd+vjp", reg_vjp, grid, reg_params[s], reg_state[s],
              feats, ct_out, ct_mid)

    # ---- 4. matching volume (scatter + trilinear background upsample) ----
    density = feats[:, :1]
    if not want("mvol"):
        density = None
    @jax.jit
    def mv(g, d, pm):
        return volume_mod.matching_and_mask_volume(
            g, d.astype(jnp.bfloat16), pm if s > 0 else None)

    @jax.jit
    def mv_vjp(g, d, pm, ct):
        out, vjp = jax.vjp(
            lambda d_, pm_: volume_mod.matching_and_mask_volume(
                g, d_.astype(jnp.bfloat16), pm_ if s > 0 else None),
            d, pm)
        return vjp(ct)

    if density is not None:
        bench("matching_volume fwd", mv, grid, density, prev_matching)
        ct_mv = (jax.random.normal(jax.random.PRNGKey(11), (res, res, res, 1))
                 * 0.01).astype(jnp.bfloat16)
        bench("matching_volume fwd+vjp", mv_vjp, grid, density, prev_matching,
              ct_mv)
        del ct_mv

    # ---- 5. matching field ----
    if not want("mfield"):
        return
    mf_static = {"n_samples_depths": mf_samples, "depth_res_levels": res_levels}
    pre_depths = depths if s > 0 else None
    key = jax.random.PRNGKey(12)
    gvo = os.environ.get("PROF_GRAD_VIEWS_ONLY", "0") != "0"

    @jax.jit
    def mfield(mvol, pd):
        return matching_field.apply(key, mf_static, batch, mvol, s, ratios,
                                    pd if s > 0 else None, perturb=True,
                                    grad_views_only=gvo)

    bench("matching_field fwd", mfield, matching_volume, depths)

    ct_d = jax.random.normal(jax.random.PRNGKey(13), (nv, *img_hw)) * 0.01

    @jax.jit
    def mfield_vjp(mvol, pd, ct):
        out, vjp = jax.vjp(
            lambda mv_: matching_field.apply(
                key, mf_static, batch, mv_, s, ratios,
                pd if s > 0 else None, perturb=True,
                grad_views_only=gvo)[0],
            mvol)
        return vjp(ct)

    bench("matching_field fwd+vjp", mfield_vjp, matching_volume, depths, ct_d)


if __name__ == "__main__":
    main()
