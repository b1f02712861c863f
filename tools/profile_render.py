"""Component-level timing of the render hot path on the current device.

Times each stage of render_core separately (z-val construction, occupancy,
SDF forward, SDF gradients, color lookup+blending, patch warp) to guide
kernel optimization.  Run on the TPU: `python tools/profile_render.py`.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp

from surf_tpu.config import ConfigFactory
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.nn import surf, feature_net, implicit_surface, sdf_net, blending_net
from surf_tpu.ops.feature_lookup import lookup_feature
from surf_tpu.ops.homography import surface_patch_warp
from surf_tpu.ops import resize_bilinear_2d


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:32s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n_rays = int(os.environ.get("PROF_RAYS", 2048))
    base_dim = int(os.environ.get("PROF_BASE_DIM", 48))
    n_stages = int(os.environ.get("PROF_STAGES", "2"))

    conf_text = open(os.path.join(os.path.dirname(__file__), "..",
                                  "confs/surf.conf")).read()
    conf = ConfigFactory.parse_string(conf_text)
    model_conf = conf["model"]
    model_conf["volume"]["base_volume_dim"] = [base_dim] * 3
    model_conf["range_ratios"] = model_conf["range_ratios"][:n_stages]
    model_conf["feature_network"]["d_out"] = [4] * n_stages
    model_conf["reg_network"]["d_in"] = [8] + [16] * (n_stages - 1)
    model_conf["reg_network"]["d_base"] = [8] * n_stages
    model_conf["reg_network"]["d_out"] = [8] * n_stages
    for k in ["n_samples_depths", "n_importance_depths", "up_sample_steps",
              "depth_res_levels"]:
        model_conf["matching_field"][k] = model_conf["matching_field"][k][:n_stages]
    model_conf["implicit_surface"]["render"]["n_samples"] = \
        model_conf["implicit_surface"]["render"]["n_samples"][:n_stages]
    model_conf["implicit_surface"]["render"]["sample_ranges"] = \
        model_conf["implicit_surface"]["render"]["sample_ranges"][:n_stages]
    model_conf["implicit_surface"]["sdf_network"]["feat_channels"] = 7 * n_stages
    model_conf["implicit_surface"]["color_network"]["d_feature"] = 4 * n_stages
    model_conf["volume"]["stage_parent_capacity"] = \
        [(base_dim // 2) ** 3, min((base_dim // 2) ** 3, 131072),
         262144, 393216][:n_stages]
    # match bench.py: bf16 density volumes (fp32 at 704^3 OOMs one chip)
    model_conf["volume"]["matching_dtype"] = \
        os.environ.get("PROF_MATCH_DTYPE", "bfloat16")

    ds_conf = ConfigFactory.parse_string("""
    ds { num_src_view = 2
         img_hw = [288, 400]
         n_rays = 512
         n_scenes = 1
         n_views_total = 6 }""")["ds"]
    ds = SyntheticDataset(ds_conf, "train")
    batch = {k: jnp.asarray(v) for k, v in ds[0].items() if not isinstance(v, str)}
    params, state, static = surf.init(jax.random.PRNGKey(0), model_conf)

    feat_fn = jax.jit(feature_net.apply)

    def build(params, state, ipts, key):
        features = feat_fn(params["feature_network"], ipts["imgs"])
        _, stages, mv, _ = surf.build_volumes(
            key, params, state, static, ipts, features, perturb=False,
            training=False, jit_stages=True)
        return stages, mv, features

    t0 = time.time()
    stages, matching_volume, features = build(params, state, batch,
                                              jax.random.PRNGKey(1))
    jax.block_until_ready(matching_volume)
    print(f"build_volumes (compile+run)      {time.time() - t0:8.1f} s", flush=True)
    timed("build_volumes steady", lambda: build(params, state, batch,
                                                jax.random.PRNGKey(1))[1], iters=3)

    stages_ff = stages[::-1]
    feats_ff = [f for f in features][::-1]
    is_params = params["implicit_surface"]
    is_static = static["implicit_surface"]

    rays_o = jnp.tile(batch["rays_o"], (n_rays // 512 + 1, 1))[:n_rays]
    rays_d = jnp.tile(batch["rays_d"], (n_rays // 512 + 1, 1))[:n_rays]
    near = jnp.broadcast_to(batch["near"], (n_rays, 1))
    far = jnp.broadcast_to(batch["far"], (n_rays, 1))
    key = jax.random.PRNGKey(2)

    z_fn = jax.jit(lambda k: implicit_surface.build_z_vals(
        k, is_static, rays_o, rays_d, near, far, matching_volume))
    z_vals = timed("build_z_vals", z_fn, key)

    ns = z_vals.shape[1]
    mid_z = z_vals
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]).reshape(-1, 3)
    grids = [g for g, _ in stages_ff]

    occ_fn = jax.jit(lambda p: implicit_surface.occupancy_mask(grids, p))
    timed("occupancy_mask", occ_fn, pts)

    sdf_fn = jax.jit(lambda p: sdf_net.apply(is_params["sdf_network"],
                                             is_static["sdf"], p, stages_ff))
    timed("sdf forward", sdf_fn, pts)

    grad_fn = jax.jit(lambda p: sdf_net.gradient(is_params["sdf_network"],
                                                 is_static["sdf"], p, stages_ff))
    timed("sdf gradient+smooth", grad_fn, pts)

    lookup_fn = jax.jit(lambda p: lookup_feature(
        p, batch["imgs"], batch["intrs"], batch["c2ws"], feats_ff))
    rgb_feat, ray_diff, src_mask = timed("lookup_feature", lookup_fn, pts)

    blend_fn = jax.jit(lambda a, b, c: blending_net.apply(
        is_params["color_network"], is_static["blend"], a, b, c))
    timed("blending_net", blend_fn, rgb_feat, ray_diff, src_mask)

    def warp_fn(p0, g0):
        hw = feats_ff[0].shape[1:3]
        ups = [feats_ff[0]] + [
            jax.vmap(lambda m: resize_bilinear_2d(m, hw))(mm)
            for mm in feats_ff[1:3]]
        wf = jnp.concatenate(ups, axis=-1)
        return surface_patch_warp(p0, g0, wf, batch["intrs"], batch["c2ws"])

    p0 = rays_o + rays_d
    g0 = jnp.ones_like(p0) / jnp.sqrt(3.0)
    timed("patch warp (incl feat resize)", jax.jit(warp_fn), p0, g0)

    full_fn = jax.jit(lambda k: implicit_surface.render(
        k, is_params, is_static, rays_o, rays_d, near, far, matching_volume,
        stages_ff, feats_ff, feats_ff, batch["imgs"], batch["intrs"],
        batch["c2ws"], 1.0, 2.0)["color_fine"])
    timed("FULL render", full_fn, key)
    print(f"rays={n_rays} samples/ray={ns}")


if __name__ == "__main__":
    main()
