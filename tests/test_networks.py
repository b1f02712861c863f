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
