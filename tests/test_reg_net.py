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


def _grad_pair(f_custom, f_raw, args_c, args_r, wrt_c, wrt_r):
    gc = jax.grad(f_custom, argnums=wrt_c)(*args_c)
    gr = jax.grad(f_raw, argnums=wrt_r)(*args_r)
    for a, b in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_custom_vjp_subm_child():
    """subm_conv_child's gather-transpose VJP == XLA autodiff of the raw op."""
    grid, feats = make_grid(res=16, p_keep=0.4, c_in=6)
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    ct = jnp.asarray(RNG.randn(grid.capacity, 5).astype(np.float32))
    ct = ct * grid.cvalid[:, None]  # downstream ops always mask child rows

    _grad_pair(
        lambda w_, x_: jnp.sum(reg_net.subm_conv_child(w_, x_, grid) * ct),
        lambda w_, x_: jnp.sum(reg_net._subm_conv_child({"w": w_}, grid, x_) * ct),
        (w, feats), (w, feats), (0, 1), (0, 1))


def test_custom_vjp_subm_parent():
    grid, _ = make_grid(res=16, p_keep=0.4)
    P = grid.parents.shape[0]
    pactive = grid.pvalid & jnp.any(grid.cvalid.reshape(-1, 8), axis=1)
    xp = jnp.asarray(RNG.randn(P, 6).astype(np.float32)) * pactive[:, None]
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    ct = jnp.asarray(RNG.randn(P, 5).astype(np.float32)) * pactive[:, None]

    _grad_pair(
        lambda w_, x_: jnp.sum(
            reg_net.subm_conv_parent(w_, x_, grid, pactive) * ct),
        lambda w_, x_: jnp.sum(
            reg_net._subm_conv_parent({"w": w_}, grid, x_, pactive) * ct),
        (w, xp), (w, xp), (0, 1), (0, 1))


def test_custom_vjp_down_child_to_parent():
    grid, feats = make_grid(res=16, p_keep=0.4, c_in=6)
    P = grid.parents.shape[0]
    pactive = grid.pvalid & jnp.any(grid.cvalid.reshape(-1, 8), axis=1)
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    # ct masked by pactive — the contract the custom bwd relies on
    ct = jnp.asarray(RNG.randn(P, 5).astype(np.float32)) * pactive[:, None]

    _grad_pair(
        lambda w_, x_: jnp.sum(
            reg_net.down_conv_child_to_parent(w_, x_, grid, pactive) * ct),
        lambda w_, x_: jnp.sum(
            reg_net._down_conv_child_to_parent({"w": w_}, grid, x_) * ct),
        (w, feats), (w, feats), (0, 1), (0, 1))


def test_custom_vjp_up_parent_to_child():
    grid, _ = make_grid(res=16, p_keep=0.4)
    P = grid.parents.shape[0]
    pactive = grid.pvalid & jnp.any(grid.cvalid.reshape(-1, 8), axis=1)
    xp = jnp.asarray(RNG.randn(P, 6).astype(np.float32)) * pactive[:, None]
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    ct = jnp.asarray(RNG.randn(grid.capacity, 5).astype(np.float32))

    _grad_pair(
        lambda w_, x_: jnp.sum(
            reg_net.up_conv_parent_to_child(w_, x_, grid, pactive) * ct),
        lambda w_, x_: jnp.sum(
            reg_net._up_conv_parent_to_child({"w": w_}, grid, x_, pactive) * ct),
        (w, xp), (w, xp), (0, 1), (0, 1))


def test_custom_vjp_down_parent_to_dense():
    grid, _ = make_grid(res=16, p_keep=0.4)
    P = grid.parents.shape[0]
    r4 = grid.res // 4
    pactive = grid.pvalid & jnp.any(grid.cvalid.reshape(-1, 8), axis=1)
    xp = jnp.asarray(RNG.randn(P, 6).astype(np.float32)) * pactive[:, None]
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    # dense cotangent masked by the written-cell set (= m2 downstream)
    occ = reg_net._scatter_parent_occupancy(grid, pactive)
    m2 = reg_net._maxpool2(occ).astype(np.float32)[..., None]
    ct = jnp.asarray(RNG.randn(r4, r4, r4, 5).astype(np.float32)) * m2

    _grad_pair(
        lambda w_, x_: jnp.sum(
            reg_net.down_conv_parent_to_dense(w_, x_, grid, pactive, r4) * ct),
        lambda w_, x_: jnp.sum(
            reg_net._down_conv_parent_to_dense({"w": w_}, grid, x_, pactive, r4) * ct),
        (w, xp), (w, xp), (0, 1), (0, 1))


def test_custom_vjp_up_dense_to_parent():
    grid, _ = make_grid(res=16, p_keep=0.4)
    P = grid.parents.shape[0]
    r4 = grid.res // 4
    pactive = grid.pvalid & jnp.any(grid.cvalid.reshape(-1, 8), axis=1)
    occ = reg_net._scatter_parent_occupancy(grid, pactive)
    m2 = reg_net._maxpool2(occ).astype(np.float32)[..., None]
    dense_raw = jnp.asarray(RNG.randn(r4, r4, r4, 6).astype(np.float32))
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    ct = jnp.asarray(RNG.randn(P, 5).astype(np.float32)) * pactive[:, None]

    # the op's real input is an m2-masked dense level: feeding dense*m2
    # makes the active-cells-only cotangent truncation exact
    _grad_pair(
        lambda w_, d_: jnp.sum(
            reg_net.up_conv_dense_to_parent(w_, d_ * m2, grid, pactive) * ct),
        lambda w_, d_: jnp.sum(
            reg_net._up_conv_dense_to_parent({"w": w_}, grid, d_ * m2) * ct),
        (w, dense_raw), (w, dense_raw), (0, 1), (0, 1))


def test_nbr_ops_match_table_ops():
    """The neighbor-table conv kernels (one arithmetic-indexed gather per
    tap) must equal the two-level table-lookup kernels — values AND
    gradients, for all four op types."""
    grid, feats = make_grid(res=16, p_keep=0.4, c_in=6)
    nbr = reg_net.parent_neighbor_rows(grid)
    P = grid.parents.shape[0]
    pactive = grid.pvalid & jnp.any(grid.cvalid.reshape(-1, 8), axis=1)
    cval = grid.cvalid
    xp = jnp.asarray(RNG.randn(P, 6).astype(np.float32)) * pactive[:, None]
    w = jnp.asarray(RNG.randn(3, 3, 3, 6, 5).astype(np.float32)) * 0.2
    ct_c = jnp.asarray(RNG.randn(grid.capacity, 5).astype(np.float32)) \
        * cval[:, None]
    ct_p = jnp.asarray(RNG.randn(P, 5).astype(np.float32)) * pactive[:, None]

    cases = [
        ("subm_child",
         lambda w_, x_: jnp.sum(
             reg_net.subm_conv_child_nbr(w_, x_, nbr, cval) * ct_c),
         lambda w_, x_: jnp.sum(
             reg_net.subm_conv_child(w_, x_, grid) * ct_c),
         feats),
        ("subm_parent",
         lambda w_, x_: jnp.sum(
             reg_net.subm_conv_parent_nbr(w_, x_, nbr, pactive) * ct_p),
         lambda w_, x_: jnp.sum(
             reg_net.subm_conv_parent(w_, x_, grid, pactive) * ct_p),
         xp),
        ("down_c2p",
         lambda w_, x_: jnp.sum(
             reg_net.down_conv_c2p_nbr(w_, x_, nbr, pactive, cval) * ct_p),
         lambda w_, x_: jnp.sum(
             reg_net.down_conv_child_to_parent(w_, x_, grid, pactive) * ct_p),
         feats),
        ("up_p2c",
         lambda w_, x_: jnp.sum(
             reg_net.up_conv_p2c_nbr(w_, x_, nbr, cval, pactive) * ct_c),
         lambda w_, x_: jnp.sum(
             reg_net.up_conv_parent_to_child(w_, x_, grid, pactive) * ct_c),
         xp),
    ]
    for name, f_new, f_old, x in cases:
        v_new = float(f_new(w, x))
        v_old = float(f_old(w, x))
        assert np.isclose(v_new, v_old, rtol=1e-4), (name, v_new, v_old)
        g_new = jax.grad(f_new, argnums=(0, 1))(w, x)
        g_old = jax.grad(f_old, argnums=(0, 1))(w, x)
        for a, b in zip(g_new, g_old):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=name)


def test_parent_neighbor_rows():
    """nbr[p, t] must equal the parent-table lookup at parents[p]+off_t."""
    grid, _ = make_grid(res=16, p_keep=0.4)
    nbr = np.asarray(reg_net.parent_neighbor_rows(grid))
    half = grid.res // 2
    table = np.asarray(grid.parent_table)
    parents = np.asarray(grid.parents)
    offs = np.asarray(reg_net._OFFSETS_NP)
    for t in range(27):
        nb = parents + offs[t]
        inb = np.all((nb >= 0) & (nb < half), axis=-1)
        c = np.clip(nb, 0, half - 1)
        expect = np.where(inb, table[c[:, 0], c[:, 1], c[:, 2]], -1)
        np.testing.assert_array_equal(nbr[:, t], expect)


def test_hybrid_gradients_match_dense():
    """End-to-end U-Net gradients: the hybrid path (custom gather-transpose
    VJPs) must match the dense path (XLA conv autodiff) — params and input
    features both."""
    grid, feats = make_grid(res=16, p_keep=0.5)
    params, state = reg_net.init(jax.random.PRNGKey(3), d_in=8, d_out=4, d_base=4)
    r1 = jnp.asarray(RNG.randn(grid.capacity, 4).astype(np.float32))
    r2 = jnp.asarray(RNG.randn(grid.capacity, 4).astype(np.float32))

    def loss(apply_fn, p, f):
        out, mid, _ = apply_fn(p, state, grid, f, training=False)
        return jnp.sum(out * r1) + jnp.sum(mid * r2)

    gd = jax.grad(lambda p, f: loss(reg_net.apply_dense, p, f),
                  argnums=(0, 1))(params, feats)
    gh = jax.grad(lambda p, f: loss(reg_net.apply_hybrid, p, f),
                  argnums=(0, 1))(params, feats)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4),
        gh, gd)


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
