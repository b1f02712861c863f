"""The sparse U-Net's two execution paths (dense-masked XLA convs vs
gather/scatter over voxel lists) must produce identical results — this is
the submanifold-equivalence property SURVEY.md §7 calls out as a hard part."""

import numpy as np
import jax
import jax.numpy as jnp

from surf_tpu.nn import reg_net
from surf_tpu.ops import sparse as sp

RNG = np.random.RandomState(7)


def make_grid(res=16, p_keep=0.35, c_in=8):
    half = res // 2
    all_parents = np.stack(np.meshgrid(*([np.arange(half)] * 3), indexing="ij"),
                           axis=-1).reshape(-1, 3)
    keep = RNG.rand(len(all_parents)) < p_keep
    parents = all_parents[keep].astype(np.int32)
    P = len(parents)
    pvalid = np.ones(P, bool)
    cvalid = RNG.rand(P * 8) < 0.85
    grid = sp.make_grid(jnp.asarray(parents), jnp.asarray(pvalid),
                        jnp.asarray(cvalid), res)
    feats = RNG.randn(P * 8, c_in).astype(np.float32)
    feats = feats * np.asarray(grid.cvalid)[:, None]
    return grid, jnp.asarray(feats)


def test_hybrid_matches_dense_eval():
    grid, feats = make_grid()
    params, state = reg_net.init(jax.random.PRNGKey(0), d_in=8, d_out=8, d_base=8)
    # randomize BN running stats so eval mode is non-trivial
    state = jax.tree.map(
        lambda x: x + jnp.abs(jnp.asarray(RNG.rand(*x.shape), x.dtype)) * 0.3, state)

    out_d, mid_d, _ = reg_net.apply_dense(params, state, grid, feats, training=False)
    out_h, mid_h, _ = reg_net.apply_hybrid(params, state, grid, feats, training=False)

    live = np.asarray(grid.cvalid)
    np.testing.assert_allclose(np.asarray(mid_d)[live], np.asarray(mid_h)[live],
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d)[live], np.asarray(out_h)[live],
                               atol=2e-4, rtol=1e-4)


def test_hybrid_matches_dense_training_stats():
    # NB: res must be large enough that the deepest level (res/8) has more
    # than a couple of active sites, otherwise batch-norm variances vanish
    # and rsqrt(eps) amplifies fp32 noise unboundedly (real stages are
    # >= 88^3, where this is a non-issue).
    grid, feats = make_grid(res=16, p_keep=0.6)
    params, state = reg_net.init(jax.random.PRNGKey(1), d_in=8, d_out=4, d_base=4)
    out_d, _, ns_d = reg_net.apply_dense(params, state, grid, feats, training=True)
    out_h, _, ns_h = reg_net.apply_hybrid(params, state, grid, feats, training=True)
    live = np.asarray(grid.cvalid)
    np.testing.assert_allclose(np.asarray(out_d)[live], np.asarray(out_h)[live],
                               atol=5e-3, rtol=1e-2)
    # running-stat updates agree too (masked statistics over the active set)
    for name in ns_d:
        np.testing.assert_allclose(np.asarray(ns_d[name]["bn"]["mean"]),
                                   np.asarray(ns_h[name]["bn"]["mean"]),
                                   atol=5e-3, rtol=1e-2)


def test_inactive_rows_are_zero():
    grid, feats = make_grid(res=8, p_keep=0.5)
    params, state = reg_net.init(jax.random.PRNGKey(2), d_in=8, d_out=4, d_base=4)
    out, mid, _ = reg_net.apply_dense(params, state, grid, feats, training=False)
    dead = ~np.asarray(grid.cvalid)
    np.testing.assert_allclose(np.asarray(mid)[dead], 0.0, atol=1e-6)


def test_conv3d_stride2_slabbed_matches():
    """The x-slabbed stride-2 conv == the monolithic one (training at fine
    stages slabs to bound the conv-backward temporaries)."""
    import jax
    import jax.numpy as jnp
    from surf_tpu.nn.core import conv3d_init, conv3d_apply
    from surf_tpu.nn.reg_net import conv3d_stride2_slabbed

    rng = np.random.RandomState(3)
    p = conv3d_init(jax.random.PRNGKey(0), 5, 7, 3, bias=True)
    x = jnp.asarray(rng.randn(1, 32, 20, 20, 5).astype(np.float32))
    ref = conv3d_apply(p, x, stride=2)
    for nslab in (3, 4, 5):
        out = conv3d_stride2_slabbed(p, x, nslab=nslab)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
