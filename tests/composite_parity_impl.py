"""Composite forward parity: torch reference SuRF vs surf_tpu (VERDICT r3 #3).

Runs the reference `SuRF.forward` (models/surf.py:133-163) end-to-end on CPU
with random weights (torchsparse/cuda_gridsample/mcubes CPU shims), converts
the state_dict with convert_checkpoint, runs the surf_tpu composite on
identical inputs, and compares outputs through every cross-module hand-off:
feature net -> cascade (back-projection, depth filtering, sparse U-Net,
matching field) -> NeuS render (SDF MLP + double grads, blending, zero
crossing, patch warp).  This is the strongest checkpoint-parity evidence
obtainable without the published weights (unavailable in this image).

Determinism: all torch.rand sites are (rand - 0.5)-style jitters
(implicit_surface.py:276,305, matching_field.py:34) or the random sphere
sample (implicit_surface.py:174); patching torch.rand -> 0.5 zeroes the
jitters exactly, and the jax side runs with perturb=False.  conf
render.perturb = 0 on both sides.  The random-sphere `sparse_sdf` rows and
anything downstream of them are excluded from comparison.

Run standalone (exit 0 = parity): python tests/composite_parity_impl.py
Invoked by tests/test_composite_parity.py as a subprocess (isolates the
sys.modules shims and the torch.Tensor.cuda patch from the test session).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from torch_shims import install

install()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from models.surf import SuRF                        # reference, via shims

from surf_tpu.config import ConfigFactory
from surf_tpu.convert.torch_converter import convert_checkpoint
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.nn import surf

_MISS = object()


class TConf(dict):
    """pyhocon-ish accessor shim over nested dicts for the reference
    modules (dotted paths, typed getters, ** unpacking)."""

    def _get(self, path, default=_MISS):
        cur = self
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                if default is _MISS:
                    raise KeyError(path)
                return default
            cur = dict.__getitem__(cur, part) if isinstance(cur, TConf) \
                else cur[part]
        return cur

    def get(self, k, default=None):
        v = self._get(k, default)
        return v

    def __getitem__(self, k):
        v = self._get(k)
        return TConf(v) if isinstance(v, dict) and not isinstance(v, TConf) else v

    def get_int(self, k, default=_MISS):
        return int(self._get(k, default))

    def get_float(self, k, default=_MISS):
        return float(self._get(k, default))

    def get_bool(self, k, default=_MISS):
        return bool(self._get(k, default))

    def get_string(self, k, default=_MISS):
        return str(self._get(k, default))

    def get_list(self, k, default=None):
        return self._get(k, default)


# -- matched tiny 2-stage protocol ------------------------------------------

BASE = 16
IMG_HW = (48, 64)
N_RAYS = 64
FEAT_CH = 21            # 3 stages x 7 mid channels (the reference patch warp
                        # hardcodes the 3 finest feature levels,
                        # implicit_surface.py:230-243 -> >= 3 stages)

MODEL_T = TConf({
    "range_ratios": [1.0, 0.4, 0.1],
    "feature_network": {"d_in": 3, "d_base": 8, "d_out": [4, 4, 4]},
    "volume": {"base_volume_dim": [BASE, BASE, BASE]},
    "reg_network": {"d_in": [8, 16, 16], "d_base": [8, 8, 8],
                    "d_out": [8, 8, 8]},
    "matching_field": {
        "n_samples_depths": [16, 8, 8],
        "n_importance_depths": [16, 8, 8],
        "up_sample_steps": [2, 2, 2],
        "depth_res_levels": [4, 2, 1],
    },
    "implicit_surface": {
        "sdf_network": {
            "d_out": 129, "d_in": 3, "d_hidden": 128, "n_layers": 6,
            "skip_in": [3], "multires": 4, "bias": 0.5, "scale": 1.0,
            "geometric_init": True, "weight_norm": True,
            "feat_channels": FEAT_CH, "feat_multires": 0,
        },
        "color_network": {"d_feature": 12},
        "variance_network": {"init_val": 0.3},
        "render": {
            "n_samples": [16, 8, 8], "sample_ranges": [1.0, 0.4, 0.1],
            "n_depth": 32, "perturb": 0.0,
        },
    },
})

MODEL_J = ConfigFactory.parse_string(f"""
model {{
    range_ratios = [1.0, 0.4, 0.1]
    feature_network {{ d_in = 3  d_base = 8  d_out = [4, 4, 4] }}
    volume {{
        base_volume_dim = [{BASE}, {BASE}, {BASE}]
        stage_parent_capacity = [{(BASE // 2) ** 3}, {BASE ** 3}, {(2 * BASE) ** 3}]
    }}
    reg_network {{ d_in = [8, 16, 16]  d_base = [8, 8, 8]  d_out = [8, 8, 8] }}
    matching_field {{
        n_samples_depths = [16, 8, 8]
        n_importance_depths = [16, 8, 8]
        up_sample_steps = [2, 2, 2]
        depth_res_levels = [4, 2, 1]
    }}
    implicit_surface {{
        sdf_network {{
            d_out = 129  d_in = 3  d_hidden = 128  n_layers = 6
            skip_in = [3]  multires = 4  bias = 0.5  scale = 1.0
            geometric_init = True  weight_norm = True
            feat_channels = {FEAT_CH}  feat_multires = 0
        }}
        color_network {{ d_feature = 12 }}
        variance_network {{ init_val = 0.3 }}
        render {{
            n_samples = [16, 8, 8]
            sample_ranges = [1.0, 0.4, 0.1]
            n_depth = 32
            perturb = 0.0
            fused_pyramid = False
        }}
    }}
}}
""")["model"]

DS_CONF = ConfigFactory.parse_string(f"""
ds {{
    num_src_view = 2
    img_hw = [{IMG_HW[0]}, {IMG_HW[1]}]
    n_rays = {N_RAYS}
    n_scenes = 1
    n_views_total = 6
}}
""")["ds"]


def torch_ipts(batch):
    t = {}
    t["imgs"] = torch.from_numpy(
        np.ascontiguousarray(batch["imgs"].transpose(0, 3, 1, 2)))
    for k in ("intrs", "c2ws", "near_fars", "rays_o", "rays_d",
              "near", "far", "pseudo_pts"):
        t[k] = torch.from_numpy(np.asarray(batch[k]))
    t["src_idx"] = int(batch["src_idx"])
    return t


_real_rand = torch.rand


def _half_rand(*size, **kw):
    if len(size) == 1 and isinstance(size[0], (list, tuple)):
        size = tuple(size[0])
    kw = {k: v for k, v in kw.items() if k in ("dtype", "device")}
    return torch.full(size, 0.5, **kw)


def _cmp(name, got, ref, atol, outlier_frac=0.0, outlier_atol=None):
    got = np.asarray(got, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    assert got.shape == ref.shape, f"{name}: shape {got.shape} vs {ref.shape}"
    d = np.abs(got - ref)
    if outlier_frac:
        # crossing-style outputs: sign tests can flip one sample on fp noise;
        # require the bulk within atol and even outliers bounded
        bad = d > atol
        frac = bad.mean()
        assert frac <= outlier_frac, \
            f"{name}: {frac:.4f} of entries exceed atol={atol} (max {d.max():.3e})"
        if outlier_atol is not None:
            assert d.max() <= outlier_atol, \
                f"{name}: max diff {d.max():.3e} > {outlier_atol}"
    else:
        assert d.max() <= atol, f"{name}: max diff {d.max():.3e} > {atol}"
    print(f"  {name:24s} max|d|={d.max():.3e}  ok")


def main():
    torch.manual_seed(0)
    ds = SyntheticDataset(DS_CONF, "train")
    batch = ds[0]

    model = SuRF(MODEL_T).eval()
    ipts_t = torch_ipts(batch)

    print("torch composite forward (train mode)...")
    torch.rand = _half_rand
    try:
        out_t = model("train", ipts_t, cos_anneal_ratio=0.8, step=3)
    finally:
        torch.rand = _real_rand
    out_t = {k: (v.detach().numpy() if torch.is_tensor(v) else v)
             for k, v in out_t.items()}

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, state = convert_checkpoint(sd, num_stage=3, sdf_layers=7)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    # statics from a throwaway init (same conf -> same statics)
    _, _, static = surf.init(jax.random.PRNGKey(0), MODEL_J)

    ipts_j = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, str)}

    print("surf_tpu composite forward (train mode)...")
    out_j, _ = surf.forward(
        jax.random.PRNGKey(1), params, state, static, "train", ipts_j,
        cos_anneal_ratio=0.8, step=3.0, training=False, perturb=False)
    out_j = {k: np.asarray(v) for k, v in out_j.items()}

    h, w = IMG_HW
    print("comparing train-mode outputs:")
    # cascade outputs: per-stage matching-field depths (ref + src view)
    for s in range(3):
        _cmp(f"depth_stage{s}", out_j[f"depth_stage{s}"],
             out_t[f"depth_stage{s}"], atol=1e-4)
        _cmp(f"depth_src_stage{s}", out_j[f"depth_src_stage{s}"],
             out_t[f"depth_src_stage{s}"], atol=1e-4)
    # render outputs
    _cmp("color_fine", out_j["color_fine"], out_t["color_fine"], atol=1e-4)
    _cmp("render_depth", out_j["render_depth"], out_t["render_depth"],
         atol=1e-4)
    # zero-crossing depth: discrete first-sign-change selection could flip
    # an isolated sample on fp noise -> small outlier allowance
    _cmp("sdf_depth", out_j["sdf_depth"], out_t["sdf_depth"], atol=1e-4,
         outlier_frac=0.02, outlier_atol=2.0)
    _cmp("gradient_error", out_j["gradient_error"], out_t["gradient_error"],
         atol=1e-5)
    _cmp("pseudo_sdf", out_j["pseudo_sdf"], out_t["pseudo_sdf"], atol=1e-4)
    # patch-warp NCC inputs at the surface crossing
    for k in ("ref_gray_val", "sampled_gray_val"):
        if k in out_j and k in out_t:
            _cmp(k, out_j[k], out_t[k], atol=5e-4,
                 outlier_frac=0.02, outlier_atol=1.0)

    # ---- val mode ----------------------------------------------------------
    ds_val = SyntheticDataset(ConfigFactory.parse_string(f"""
    ds {{
        num_src_view = 2
        img_hw = [{IMG_HW[0]}, {IMG_HW[1]}]
        val_res_level = 4
        n_scenes = 1
        n_views_total = 6
    }}
    """)["ds"], "val")
    vb = ds_val[0]

    ipts_vt = torch_ipts(vb)
    ipts_vt["bound_min"] = torch.from_numpy(np.asarray(vb["bound_min"]))
    ipts_vt["bound_max"] = torch.from_numpy(np.asarray(vb["bound_max"]))
    ipts_vt["hw"] = tuple(int(x) for x in vb["hw"])

    # shrink the reference's hard-coded 512^3 mesh grid to something CPU can
    # evaluate: validate(..., extract_geometry=True, mesh_resolution=32)
    from models.modules.implicit_surface import ImplicitSurface
    d = list(ImplicitSurface.validate.__defaults__)
    d[-2] = 32
    ImplicitSurface.validate.__defaults__ = tuple(d)

    print("torch composite forward (val mode)...")
    torch.rand = _half_rand
    try:
        with torch.no_grad():
            out_vt = model("val", ipts_vt, cos_anneal_ratio=1.0, step=3)
    finally:
        torch.rand = _real_rand

    print("surf_tpu composite forward (val mode)...")
    ipts_vj = {k: jnp.asarray(v) for k, v in vb.items()
               if not isinstance(v, str)}
    from surf_tpu.nn import feature_net, implicit_surface, sdf_net
    features = feature_net.apply(params["feature_network"], ipts_vj["imgs"])
    _, stages, matching_volume, _ = surf.build_volumes(
        jax.random.PRNGKey(2), params, state, static, ipts_vj, features,
        perturb=False, training=False)
    match_features = feature_net.apply(state["match_feature_network"],
                                       ipts_vj["imgs"])
    stages_ff = stages[::-1]
    feats_ff = features[::-1]
    match_ff = match_features[::-1]

    n_rays_full = ipts_vj["rays_o"].shape[0]
    near = jnp.broadcast_to(ipts_vj["near"], (n_rays_full, 1))
    far = jnp.broadcast_to(ipts_vj["far"], (n_rays_full, 1))
    render_out = implicit_surface.render(
        jax.random.PRNGKey(3), params["implicit_surface"],
        static["implicit_surface"], ipts_vj["rays_o"], ipts_vj["rays_d"],
        near, far, matching_volume, stages_ff, feats_ff, match_ff,
        ipts_vj["imgs"], ipts_vj["intrs"], ipts_vj["c2ws"], 1.0, 3.0)

    print("comparing val-mode outputs:")
    _cmp("val color_fine", render_out["color_fine"], out_vt["color_fine"],
         atol=1e-4)
    _cmp("val render_depth", render_out["render_depth"],
         out_vt["render_depth"], atol=1e-4)
    _cmp("val sdf_depth", render_out["sdf_depth"], out_vt["sdf_depth"],
         atol=1e-4, outlier_frac=0.02, outlier_atol=2.0)

    # mesh: SDF lattice parity through lookup_sparse_volume + marching cubes
    # (both sides run surf_tpu's C++ MC -> identical grids give identical
    # vertex streams)
    res = 32
    lin = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.asarray(
        np.stack([xx, yy, zz], -1).reshape(-1, 3))
    sdf_grid = np.asarray(
        sdf_net.sdf_only(params["implicit_surface"]["sdf_network"],
                         static["implicit_surface"]["sdf"], pts,
                         stages_ff)).reshape(res, res, res)
    from surf_tpu.geometry import marching_cubes as mc
    verts_j, tris_j = mc(-sdf_grid, 0.0)
    verts_j = verts_j / (res - 1.0) * 2.0 - 1.0
    verts_t, tris_t = out_vt["vertices"], out_vt["triangles"]
    assert verts_j.shape == verts_t.shape, \
        f"mesh verts {verts_j.shape} vs {verts_t.shape}"
    assert tris_j.shape == tris_t.shape
    _cmp("val mesh vertices", verts_j, verts_t, atol=1e-4)

    print("COMPOSITE PARITY OK")


if __name__ == "__main__":
    main()
