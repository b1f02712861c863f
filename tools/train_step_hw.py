"""One full-protocol training step on real hardware (VERDICT #2 round-1 gap).

Runs fwd+bwd+Adam at the reference's TRAINING protocol — 4-stage cascade
88^3 -> 704^3, 480x640 images, 5 views (4 src), 512 rays, all loss terms —
via the staged per-stage-VJP path (nn/train_staged.py), which never builds
the whole cascade into one XLA graph.  Reports compile and steady-state
ms/step and the loss, for STATUS.md.

Usage: python tools/train_step_hw.py [n_steps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from surf_tpu.config import ConfigFactory
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.losses import make_loss_config
from surf_tpu.nn import surf, train_staged


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    base_dim = int(os.environ.get("TRAIN_BASE_DIM", 88))
    n_stages = int(os.environ.get("TRAIN_STAGES", 4))
    n_rays = int(os.environ.get("TRAIN_RAYS", 512))
    img_hw = (480, 640)  # reference training size (README.md:87: 480x640)

    ratios = [1.0, 0.4, 0.1, 0.01][:n_stages]
    mf = [128, 64, 32, 16][:n_stages]
    rl = [4, 2, 2, 1][:n_stages]
    ns = [64, 32, 24, 16][:n_stages]
    caps = [(base_dim // 2) ** 3, (base_dim // 2) ** 3, 262144, 393216][:n_stages]
    sw = [0.25, 0.5, 0.75, 1.0][-n_stages:]

    conf = ConfigFactory.parse_string(f"""
    ds {{
        num_src_view = 4
        img_hw = [{img_hw[0]}, {img_hw[1]}]
        n_rays = {n_rays}
        n_scenes = 1
        n_views_total = 6
    }}
    loss {{
        color_weight = 1.0
        sparse_weight = 0.02
        igr_weight = 0.1
        sparse_scale_factor = 100
        mfc_weight = 1.0
        smooth_weight = 0.0001
        tv_weight = 0.0
        depth_weight = 0.0
        ptloss_weight = 1.0
        pseudo_auxi_depth_weight = 1.0
        pseudo_sdf_weight = 1.0
        stage_weights = [{", ".join(str(w) for w in sw)}]
        pseudo_depth_weight = 1.0
    }}
    model {{
        range_ratios = [{", ".join(str(r) for r in ratios)}]
        feature_network {{ d_in = 3  d_base = 8  d_out = [{", ".join(["4"] * n_stages)}] }}
        volume {{
            base_volume_dim = [{base_dim}, {base_dim}, {base_dim}]
            stage_parent_capacity = [{", ".join(str(c) for c in caps)}]
            matching_dtype = bfloat16
        }}
        reg_network {{
            d_in = [{", ".join(["8"] + ["16"] * (n_stages - 1))}]
            d_base = [{", ".join(["8"] * n_stages)}]
            d_out = [{", ".join(["8"] * n_stages)}]
        }}
        matching_field {{
            n_samples_depths = [{", ".join(str(s) for s in mf)}]
            n_importance_depths = [{", ".join(str(s) for s in mf)}]
            up_sample_steps = [{", ".join(["8"] * n_stages)}]
            depth_res_levels = [{", ".join(str(s) for s in rl)}]
        }}
        implicit_surface {{
            sdf_network {{
                d_out = 129  d_in = 3  d_hidden = 128  n_layers = 6
                skip_in = [3]  multires = 4  bias = 0.5  scale = 1.0
                geometric_init = True  weight_norm = True
                feat_channels = {7 * n_stages}  feat_multires = 0
            }}
            color_network {{ d_feature = {4 * n_stages} }}
            variance_network {{ init_val = 0.3 }}
            render {{
                n_samples = [{", ".join(str(s) for s in ns)}]
                sample_ranges = [{", ".join(str(r) for r in ratios)}]
                n_depth = 256
                perturb = 1.0
            }}
        }}
    }}
    """)

    ds = SyntheticDataset(conf["ds"], "train")
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()
             if not isinstance(v, str)}
    params, state, static = surf.init(jax.random.PRNGKey(0), conf["model"])
    loss_cfg = make_loss_config(conf["loss"])
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    step_fn = train_staged.make_staged_train_step(optimizer, static, loss_cfg)
    key = jax.random.PRNGKey(1)

    print(f"# device={jax.devices()[0].device_kind} TRAIN protocol: "
          f"stages={n_stages} base={base_dim} img={img_hw} rays={n_rays} "
          f"src_views=4", file=sys.stderr)

    times = []
    for i in range(n_steps):
        key, k = jax.random.split(key)
        t0 = time.time()
        params, state, opt_state, res = step_fn(
            params, state, opt_state, batch, k, float(i), 1.0)
        jax.block_until_ready(params["implicit_surface"])
        dt = time.time() - t0
        times.append(dt)
        print(f"step {i}: {dt:7.1f} s  loss={float(res['loss']):.4f} "
              f"color={float(res['color_loss']):.4f} "
              f"psnr={float(res['psnr']):.2f}")
        assert np.isfinite(float(res["loss"])), "non-finite loss"

    if len(times) > 1:
        print(f"# steady-state: {np.mean(times[1:]):.1f} s/step "
              f"(first step incl. compiles: {times[0]:.1f} s)")


if __name__ == "__main__":
    main()
