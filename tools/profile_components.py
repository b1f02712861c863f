"""Component-level timing of the render hot path at full protocol scale.

Synthesizes cascade state (sphere-shell voxel sets at 88->704, dense 704^3
matching volume) instead of running the 8-minute cascade build, so render
optimizations can be iterated in seconds.  Times each stage of
implicit_surface.render independently on the real chip:

  z_vals   -- surface localization: 256-sample dense trilinear density render
  occmask  -- nearest-voxel occupancy over all 4 sparse grids
  sdfgrads -- fused SDF value+features+grad+H@1 (the 4-stage sparse lookups
              + MLP under jvp-over-grad)
  color    -- fused-pyramid feature lookup + IBRNet blending
  render   -- the whole render() for reference

Usage: python tools/profile_components.py [n_rays]
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

from surf_tpu.config import ConfigFactory
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.nn import feature_net, implicit_surface, sdf_net, blending_net
from surf_tpu.ops import sparse as sp
from surf_tpu.ops.feature_lookup import fuse_pyramid, lookup_feature_fused


def synth_grid(rng, res, parent_cap, *, dense=False):
    half = res // 2
    if dense:
        return sp.dense_base_grid(res)
    # parents clustered on the unit-sphere shell (realistic sparsity pattern)
    n = parent_cap * 2
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    r = 0.5 + rng.normal(size=(n, 1)) * 0.03
    world = v * r                                  # in [-1, 1]^3
    pc = np.round((world + 1.0) * 0.5 * (half - 1)).astype(np.int32)
    pc = np.unique(pc, axis=0)
    if pc.shape[0] >= parent_cap:
        pc = pc[:parent_cap]
        pvalid = np.ones(parent_cap, bool)
    else:
        pad = parent_cap - pc.shape[0]
        pvalid = np.concatenate([np.ones(pc.shape[0], bool), np.zeros(pad, bool)])
        pc = np.concatenate([pc, np.zeros((pad, 3), np.int32)])
    cvalid = np.repeat(pvalid, 8)
    return sp.make_grid(jnp.asarray(pc), jnp.asarray(pvalid),
                        jnp.asarray(cvalid), res)


def bench(label, fn, *args, iters=5):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 — keep profiling the other parts
        print(f"{label:>10s}:   FAILED ({type(e).__name__}) — likely OOM "
              "next to the packed/dense tables; component timing skipped")
        return float("nan")
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:>10s}: {dt:8.1f} ms/iter")
    return dt


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    img_hw = tuple(int(x) for x in
                   os.environ.get("PROF_IMG", "288x400").split("x"))
    base_dim = int(os.environ.get("PROF_BASE_DIM", 88))
    n_stages = int(os.environ.get("PROF_STAGES", 4))
    mdtype = os.environ.get("PROF_MATCH_DTYPE", "bfloat16")
    n_samples = [64, 32, 24, 16][:n_stages]
    ratios = [1.0, 0.4, 0.1, 0.01][:n_stages]
    caps = [(base_dim // 2) ** 3, (base_dim // 2) ** 3, 262144, 393216][:n_stages]
    feat_ch = 7 * n_stages
    ns_total = sum(n_samples)

    conf = ConfigFactory.parse_string(f"""
    ds {{
        num_src_view = 2
        img_hw = [{img_hw[0]}, {img_hw[1]}]
        n_rays = {n_rays}
        n_scenes = 1
        n_views_total = 6
    }}
    feature_network {{
        d_in = 3
        d_base = 8
        d_out = [{", ".join(["4"] * n_stages)}]
    }}
    implicit_surface {{
        sdf_network {{
            d_out = 129
            d_in = 3
            d_hidden = 128
            n_layers = 6
            skip_in = [3]
            multires = 4
            bias = 0.5
            scale = 1.0
            geometric_init = True
            weight_norm = True
            feat_channels = {feat_ch}
            feat_multires = 0
        }}
        color_network {{
            d_feature = {4 * n_stages}
        }}
        variance_network {{
            init_val = 0.3
        }}
        render {{
            n_samples = [{", ".join(str(s) for s in n_samples)}]
            sample_ranges = [{", ".join(str(r) for r in ratios)}]
            n_depth = 256
            perturb = 1.0
            sdf_point_chunk = {os.environ.get("PROF_SDF_CHUNK", 131072)}
        }}
    }}
    """)

    rng = np.random.default_rng(0)
    ds = SyntheticDataset(conf["ds"], "train")
    batch = {k: jnp.asarray(v) for k, v in ds[0].items() if not isinstance(v, str)}

    fn_params = feature_net.init(jax.random.PRNGKey(0), conf["feature_network"])
    features = jax.jit(feature_net.apply)(fn_params, batch["imgs"])

    is_params, is_static = implicit_surface.init(
        jax.random.PRNGKey(1), conf["implicit_surface"])
    params = {"implicit_surface": is_params}

    print(f"# synthesizing cascade state: stages={n_stages} base={base_dim} "
          f"caps={caps}", file=sys.stderr)
    stages = []
    for s in range(n_stages):
        res = base_dim * (2 ** s)
        grid = synth_grid(rng, res, caps[s], dense=(s == 0))
        # device-side RNG: uploading hundreds of MB through the tunnel is
        # slower than generating on-chip
        storage = jax.random.normal(jax.random.PRNGKey(s), (grid.capacity, 7))
        stages.append((grid, storage))
    res_fine = base_dim * 2 ** (n_stages - 1)
    matching_volume = jax.random.normal(
        jax.random.PRNGKey(99), (res_fine, res_fine, res_fine, 1),
        dtype=jnp.float32).astype(jnp.dtype(mdtype))
    jax.block_until_ready(matching_volume)
    pack_mode = os.environ.get("PROF_PACK_MATCH", "none")
    if pack_mode not in ("0", "none"):
        # corner-packed density table: 1 (full) or 2 (yz) gathers per
        # pre-render sample instead of 8
        from surf_tpu.ops import PackedVolume
        for mode in (["full", "yz"] if pack_mode == "full" else [pack_mode]):
            try:
                mv = PackedVolume.pack(matching_volume, mode)
                jax.block_until_ready(mv.packed)
                matching_volume = mv
                print(f"# pack_match: {mode}", file=sys.stderr)
                break
            except Exception as e:  # noqa: BLE001 — OOM at this size
                print(f"# pack_match[{mode}] failed ({type(e).__name__})",
                      file=sys.stderr)

    occ_vol = None
    if os.environ.get("PROF_DENSE_STORAGE", "1") != "0":
        # render-path lookup acceleration: direct-indexed bf16 volumes
        stages = [(g, sp.densify_storage(g, s)) for g, s in stages]
        occ_vol = jax.jit(sp.combined_occupancy)([g for g, _ in stages])
        if os.environ.get("PROF_PACK_STAGES", "1") != "0":
            stages = sp.pack_stages(stages)
        jax.block_until_ready(stages[-1][1].flat)
    stages_ff = stages[::-1]
    feats_ff = [f for f in features][::-1]
    warp_feats = jax.jit(implicit_surface.prepare_patch_features)(
        feats_ff, feats_ff, 2.0)

    rays_o = batch["rays_o"][:n_rays]
    rays_d = batch["rays_d"][:n_rays]
    near = jnp.broadcast_to(batch["near"], (n_rays, 1))
    far = jnp.broadcast_to(batch["far"], (n_rays, 1))
    key = jax.random.PRNGKey(2)

    dev = jax.devices()[0].device_kind
    print(f"# device={dev} rays={n_rays} samples/ray={ns_total} "
          f"fine_res={res_fine} match_dtype={mdtype} img={img_hw}")

    # ---- full render ----
    @jax.jit
    def full_render(key, mv, st, ff, wf, occ):
        return implicit_surface.render(
            key, params["implicit_surface"], is_static, rays_o, rays_d,
            near, far, mv, st, ff, ff, batch["imgs"], batch["intrs"],
            batch["c2ws"], 1.0, 2.0, warp_feats=wf, occ=occ)["color_fine"]

    t_full = bench("render", full_render, key, matching_volume, stages_ff,
                   feats_ff, warp_feats, occ_vol)

    # ---- z_vals (dense density render) ----
    @jax.jit
    def zv(key, mv):
        return implicit_surface.build_z_vals(
            key, is_static, rays_o, rays_d, near, far, mv)

    t_zv = bench("z_vals", zv, key, matching_volume)
    z_vals = zv(key, matching_volume)

    # fixed sample points for the per-component timings
    mid_z = z_vals + 2.0 / 64 * 0.5
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]).reshape(-1, 3)
    jax.block_until_ready(pts)
    print(f"# pts: {pts.shape[0]}")

    # ---- occupancy mask ----
    @jax.jit
    def occ(st, p):
        return implicit_surface.occupancy_mask([g for g, _ in st], p)

    t_occ = bench("occmask", occ, stages_ff, pts)
    if occ_vol is not None:
        @jax.jit
        def occ2(ov, p):
            return implicit_surface.occupancy_mask(ov, p)
        t_occ = bench("occ_folded", occ2, occ_vol, pts)

    # ---- SDF fused value+grads ----
    @jax.jit
    def sg(st, p):
        return sdf_net.value_features_grads(
            params["implicit_surface"]["sdf_network"], is_static["sdf"], p, st)

    t_sg = bench("sdfgrads", sg, stages_ff, pts)

    # ---- plain SDF forward (no grads), for AD-overhead attribution ----
    @jax.jit
    def sfwd(st, p):
        return sdf_net.apply(
            params["implicit_surface"]["sdf_network"], is_static["sdf"], p, st)

    t_sf = bench("sdf_fwd", sfwd, stages_ff, pts)

    # ---- sparse lookups alone ----
    @jax.jit
    def lookups(st, p):
        return sdf_net.lookup_stage_features(p, st)

    t_lk = bench("lookups", lookups, stages_ff, pts)

    # ---- color path ----
    fused = jax.jit(fuse_pyramid)(batch["imgs"], feats_ff)
    hw_levels = [f.shape[1:3] for f in feats_ff]

    @jax.jit
    def color(fu, p):
        rgb_feat, ray_diff, src_mask = lookup_feature_fused(
            p, fu, batch["intrs"], batch["c2ws"], hw_levels)
        return blending_net.apply(
            params["implicit_surface"]["color_network"], is_static["blend"],
            rgb_feat, ray_diff, src_mask)

    t_col = bench("color", color, fused, pts)

    acc = t_zv + t_occ + t_sg + t_col
    print(f"#   sum(z_vals+occ+sdfgrads+color) = {acc:.1f} ms "
          f"vs render {t_full:.1f} ms (rest: {t_full - acc:.1f} ms)")
    print(f"#   rays/s full render: {n_rays / t_full * 1000:.0f}")


if __name__ == "__main__":
    main()
