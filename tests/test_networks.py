"""Network-level unit tests: initialization properties and identities."""

import numpy as np
import jax
import jax.numpy as jnp

from tiny_conf import tiny_conf
from surf_tpu.nn import sdf_net, blending_net, variance, feature_net
from surf_tpu.ops import sparse as sp
from surf_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


def empty_stages(conf):
    """Stages whose storages are all-zero -> SDF sees zero features."""
    stages = []
    for _ in range(2):
        grid = sp.dense_base_grid(8)
        storage = jnp.zeros((grid.capacity, 7))
        stages.append((grid, storage))
    return stages


def test_geometric_init_is_approximate_sphere():
    """With zero volume features, the SAL geometric init gives
    sdf(x) ~ |x| - bias (sdf_network.py:62-89)."""
    conf = tiny_conf()
    params, static = sdf_net.init(jax.random.PRNGKey(0),
                                  conf["model.implicit_surface.sdf_network"])
    stages = empty_stages(conf)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.9, 0.9, (128, 3)).astype(np.float32)
    sdf = np.asarray(sdf_net.sdf_only(params, static, jnp.asarray(pts), stages))[:, 0]
    expected = np.linalg.norm(pts, axis=1) - 0.5  # bias = 0.5
    # geometric init is approximate; correlation must be strong and the
    # zero level set near |x| = bias
    corr = np.corrcoef(sdf, expected)[0, 1]
    assert corr > 0.8, corr
    assert abs(np.mean(sdf - expected)) < 0.2


def test_sdf_gradient_norm_near_one_at_init():
    conf = tiny_conf()
    params, static = sdf_net.init(jax.random.PRNGKey(0),
                                  conf["model.implicit_surface.sdf_network"])
    stages = empty_stages(conf)
    pts = jnp.asarray(np.random.RandomState(1).uniform(-0.8, 0.8, (64, 3))
                      .astype(np.float32))
    grads, smooth = sdf_net.gradient(params, static, pts, stages)
    norms = np.linalg.norm(np.asarray(grads), axis=1)
    assert 0.5 < norms.mean() < 2.0  # near-eikonal at init
    assert np.isfinite(np.asarray(smooth)).all()


def test_blending_single_valid_view_returns_its_rgb():
    conf = tiny_conf()
    params, static = blending_net.init(jax.random.PRNGKey(0),
                                       conf["model.implicit_surface.color_network"])
    n, s, c = 16, 2, 8 + 3
    rng = np.random.RandomState(2)
    rgb_feat = jnp.asarray(rng.rand(n, s, c).astype(np.float32))
    ray_diff = jnp.asarray(rng.rand(n, s, 4).astype(np.float32))
    mask = jnp.asarray(np.stack([np.ones((n,), bool), np.zeros((n,), bool)], 1))
    out = blending_net.apply(params, static, rgb_feat, ray_diff, mask)
    # softmax over a single unmasked view -> exactly that view's RGB
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb_feat)[:, 0, :3],
                               atol=1e-5)


def test_variance_network():
    from surf_tpu.config import ConfigFactory
    conf = ConfigFactory.parse_string("v { init_val = 0.3 }")["v"]
    p = variance.init(conf)
    np.testing.assert_allclose(float(variance.inv_s(p)), np.exp(3.0), rtol=1e-6)


def test_fpn_output_shapes():
    conf = tiny_conf()
    params = feature_net.init(jax.random.PRNGKey(0), conf["model.feature_network"])
    x = jnp.asarray(np.random.rand(3, 64, 80, 3).astype(np.float32))
    outs = feature_net.apply(params, x)
    assert [o.shape for o in outs] == [(3, 32, 40, 4), (3, 64, 80, 4)]


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "epoch": 7,
        "model": {
            "a": np.random.rand(3, 4).astype(np.float32),
            "layers": [{"w": np.random.rand(2, 2)}, {"w": np.random.rand(1, 5)}],
            "none_field": None,
            "tup": (np.arange(3), np.arange(2)),
        },
    }
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, tree)
    out = load_checkpoint(p)
    assert int(out["epoch"]) == 7
    np.testing.assert_allclose(out["model"]["a"], tree["model"]["a"])
    np.testing.assert_allclose(out["model"]["layers"][1]["w"],
                               tree["model"]["layers"][1]["w"])
    assert out["model"]["none_field"] is None
    assert isinstance(out["model"]["tup"], tuple)
    np.testing.assert_array_equal(out["model"]["tup"][0], tree["model"]["tup"][0])


def test_feature_net_mnasnet_shapes():
    """Unused alternative backbone (feature_network_mnasnet.py:52-103):
    5 pyramid levels fine-to-coarse at strides /2../32 with conf d_out."""
    import jax
    import jax.numpy as jnp
    from surf_tpu.config import ConfigFactory
    from surf_tpu.nn import feature_net_mnasnet as fm

    conf = ConfigFactory.parse_string("""
    net {
        d_out = [4, 4, 4, 4, 4]
    }
    """)
    params = fm.init(jax.random.PRNGKey(0), conf["net"])
    imgs = jnp.zeros((2, 64, 96, 3))
    outs = fm.apply(params, imgs)
    assert len(outs) == 5
    # dec1 undoes the stem's stride 2: levels at /1, /2, /4, /8, /16
    hw = [(64, 96), (32, 48), (16, 24), (8, 12), (4, 6)]
    for o, (h, w) in zip(outs, hw):
        assert o.shape == (2, h, w, 4), o.shape
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_rendering_network_modes():
    """Unused IDR-style color MLP (rendering_network.py:9-86): all three
    input modes produce finite sigmoid colors of the right shape."""
    import jax
    import jax.numpy as jnp
    from surf_tpu.config import ConfigFactory
    from surf_tpu.nn import rendering_net

    for mode, mrv in (("idr", 4), ("no_view_dir", 0), ("no_normal", 0)):
        conf = ConfigFactory.parse_string(f"""
        net {{
            d_feature = 16
            mode = {mode}
            d_in = {9 if mode == "idr" else 6}
            d_out = 3
            d_hidden = 32
            n_layers = 2
            skip_in = [5]
            multires_view = {mrv}
            squeeze_out = True
        }}
        """)
        params, static = rendering_net.init(jax.random.PRNGKey(0), conf["net"])
        n = 13
        k = jax.random.PRNGKey(1)
        pts, nrm, vd, fv = (jax.random.normal(k, (n, 3)),
                            jax.random.normal(k, (n, 3)),
                            jax.random.normal(k, (n, 3)),
                            jax.random.normal(k, (n, 16)))
        out = rendering_net.apply(params, static, pts, nrm, vd, fv)
        assert out.shape == (n, 3)
        o = jnp.asarray(out)
        assert bool(jnp.isfinite(o).all()) and bool((o >= 0).all()) \
            and bool((o <= 1).all())


def test_neus_core_golden():
    """Golden test of the NeuS alpha/weights/zero-crossing math against a
    line-for-line torch-CPU port of the reference block
    (implicit_surface.py:126-216) on random inputs (VERDICT r2 #9)."""
    import torch
    import torch.nn.functional as F
    from surf_tpu.nn.implicit_surface import (neus_alpha_weights,
                                              neus_zero_crossing)

    rng = np.random.RandomState(3)
    nr, ns = 17, 23
    sdf = rng.randn(nr * ns, 1).astype(np.float32) * 0.3
    gradients = rng.randn(nr * ns, 3).astype(np.float32)
    dirs = rng.randn(nr * ns, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dists = np.abs(rng.randn(nr, ns)).astype(np.float32) * 0.05 + 0.01
    mid_z = np.cumsum(dists, axis=1).astype(np.float32) + 0.5
    pts = rng.randn(nr * ns, 3).astype(np.float32) * 0.7
    vmask = (rng.rand(nr * ns) > 0.25).astype(np.float32)
    inv_s = np.float32(55.0)
    anneal = 0.37
    ray_cos = rng.rand(nr).astype(np.float32) * 0.5 + 0.5

    # ---- torch port of the reference block ----
    t = {k: torch.from_numpy(v) for k, v in dict(
        sdf=sdf, gradients=gradients, dirs=dirs, dists=dists, mid_z=mid_z,
        pts=pts, vmask=vmask, ray_cos=ray_cos).items()}
    true_cos = (t["dirs"] * t["gradients"]).sum(-1, keepdim=True)
    iter_cos = -(F.relu(-true_cos * 0.5 + 0.5) * (1.0 - anneal)
                 + F.relu(-true_cos) * anneal)
    iter_cos = iter_cos * t["vmask"].reshape(-1, 1)
    est_next = t["sdf"] + iter_cos.clip(-10, 10) * t["dists"].reshape(-1, 1) * 0.5
    est_prev = t["sdf"] - iter_cos.clip(-10, 10) * t["dists"].reshape(-1, 1) * 0.5
    prev_cdf = torch.sigmoid(est_prev * inv_s)
    next_cdf = torch.sigmoid(est_next * inv_s)
    alpha_t = ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
               ).reshape(nr, ns).clip(0.0, 1.0)
    alpha_t = alpha_t * t["vmask"].reshape(nr, ns)
    pts_norm = torch.linalg.norm(t["pts"], ord=2, dim=-1).reshape(nr, ns)
    inside_t = (pts_norm < 1.0).float() * t["vmask"].reshape(nr, ns)
    relax_t = (pts_norm < 1.2).float() * t["vmask"].reshape(nr, ns)
    weights_t = alpha_t * torch.cumprod(torch.cat(
        [torch.ones(nr, 1), 1.0 - alpha_t + 1e-7], -1), -1)[:, :-1]

    sdf_d = t["sdf"].reshape(nr, ns)
    prev_sdf, next_sdf = sdf_d[:, :-1], sdf_d[:, 1:]
    vm_d = t["vmask"].reshape(nr, ns)
    valid_mask_d = ((vm_d[:, :-1] * vm_d[:, 1:]) > 0).float()
    sign = torch.where(prev_sdf * next_sdf <= 0,
                       torch.ones_like(prev_sdf), torch.zeros_like(prev_sdf))
    idx = torch.arange(ns - 1, 0, -1).float()
    tmp = torch.einsum("ab,b->ab", sign, idx) * valid_mask_d
    prev_idx = torch.argmax(tmp, 1, keepdim=True)
    next_idx = prev_idx + 1
    prev_in = torch.gather(inside_t, 1, prev_idx)
    next_in = torch.gather(inside_t, 1, next_idx)
    mid_inside_t = (0.5 * (prev_in + next_in) > 0.5).float()
    mid_inside_t = mid_inside_t * (tmp.sum(dim=1, keepdim=True) > 0).float()
    grad_d = t["gradients"].reshape(nr, ns, 3)
    g1 = torch.gather(grad_d, 1, prev_idx.unsqueeze(-1).repeat(1, 1, 3))
    g2 = torch.gather(grad_d, 1, next_idx.unsqueeze(-1).repeat(1, 1, 3))
    cos_d = (g1 * g2).sum(-1) / (torch.linalg.norm(g1, ord=2, dim=-1)
                                 * torch.linalg.norm(g2, ord=2, dim=-1) + 1e-8)
    mid_inside_t = mid_inside_t * (cos_d > 0.5)
    sdf1 = torch.gather(sdf_d, 1, prev_idx)
    sdf2 = torch.gather(sdf_d, 1, next_idx)
    z1 = torch.gather(t["mid_z"], 1, prev_idx)
    z2 = torch.gather(t["mid_z"], 1, next_idx)
    z_sdf0_t = (sdf1 * z2 - sdf2 * z1) / (sdf1 - sdf2 + 1e-10)
    sdf_depth_t = z_sdf0_t * t["ray_cos"][:, None] * mid_inside_t

    # ---- ours ----
    alpha_j, weights_j, inside_j, relax_j = neus_alpha_weights(
        jnp.asarray(sdf), jnp.asarray(gradients), jnp.asarray(dirs),
        jnp.asarray(dists), jnp.asarray(pts), jnp.asarray(vmask),
        jnp.asarray(inv_s), anneal)
    mid_inside_j, z_sdf0_j, sdf_depth_j = neus_zero_crossing(
        jnp.asarray(sdf), jnp.asarray(gradients).reshape(nr, ns, 3),
        jnp.asarray(mid_z), jnp.asarray(vmask), inside_j,
        jnp.asarray(ray_cos))

    np.testing.assert_allclose(np.asarray(alpha_j), alpha_t.numpy(),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(weights_j), weights_t.numpy(),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inside_j), inside_t.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(relax_j), relax_t.numpy(), atol=0)
    np.testing.assert_array_equal(np.asarray(mid_inside_j),
                                  mid_inside_t.numpy())
    np.testing.assert_allclose(np.asarray(z_sdf0_j), z_sdf0_t.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sdf_depth_j), sdf_depth_t.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_weight_norm_materialize_matches_and_grads_flow():
    """materialize_weight_norm folds (v, g) -> w with identical outputs,
    and gradients w.r.t. the ORIGINAL (v, g) params taken through the fold
    match direct weight-norm autodiff (PERF_NOTES round-5 #1 hoist)."""
    from surf_tpu.nn.core import materialize_weight_norm
    conf = tiny_conf()
    params, static = sdf_net.init(jax.random.PRNGKey(3),
                                  conf["model.implicit_surface.sdf_network"])
    stages = empty_stages(conf)
    pts = jnp.asarray(np.random.RandomState(0).randn(64, 3) * 0.4,
                      jnp.float32)

    out_direct = sdf_net.apply(params, static, pts, stages)
    out_folded = sdf_net.apply(materialize_weight_norm(params), static,
                               pts, stages)
    np.testing.assert_allclose(np.asarray(out_direct),
                               np.asarray(out_folded), rtol=1e-6, atol=1e-6)

    def loss_direct(p):
        return sdf_net.apply(p, static, pts, stages)[:, 0].sum()

    def loss_folded(p):
        return sdf_net.apply(materialize_weight_norm(p), static, pts,
                             stages)[:, 0].sum()

    g_direct = jax.grad(loss_direct)(params)
    g_folded = jax.grad(loss_folded)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_direct),
                    jax.tree_util.tree_leaves(g_folded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
