"""Tests for the static-capacity sparse voxel structure: sparse trilinear
lookup must agree with a dense reference implementation on the active set."""

import numpy as np
import jax
import jax.numpy as jnp

from surf_tpu.ops import sparse as sp
from surf_tpu.ops import trilinear_sample_3d

RNG = np.random.RandomState(42)


def random_grid(res=8, p_keep=0.5, c_feat=4, cap_extra=3):
    half = res // 2
    all_parents = np.stack(np.meshgrid(*([np.arange(half)] * 3), indexing="ij"),
                           axis=-1).reshape(-1, 3)
    keep = RNG.rand(len(all_parents)) < p_keep
    parents = all_parents[keep]
    P = len(parents) + cap_extra
    pad = np.zeros((cap_extra, 3), np.int32)
    parents_padded = np.concatenate([parents, pad]).astype(np.int32)
    pvalid = np.concatenate([np.ones(len(parents), bool), np.zeros(cap_extra, bool)])
    cvalid = RNG.rand(P * 8) < 0.8
    cvalid &= np.repeat(pvalid, 8)
    grid = sp.make_grid(jnp.asarray(parents_padded), jnp.asarray(pvalid),
                        jnp.asarray(cvalid), res)
    storage = jnp.asarray(RNG.randn(P * 8, c_feat).astype(np.float32))
    return grid, storage


def densify(grid, storage):
    """Dense (res,res,res,C) reference volume: zeros at absent voxels."""
    res = grid.res
    C = storage.shape[-1]
    dense = np.zeros((res, res, res, C), np.float32)
    cc = np.asarray(grid.child_coords())
    cv = np.asarray(grid.cvalid)
    st = np.asarray(storage)
    for i in range(len(cc)):
        if cv[i]:
            x, y, z = cc[i]
            dense[x, y, z] = st[i]
    return jnp.asarray(dense)


def test_lookup_rows_roundtrip():
    grid, storage = random_grid()
    cc = grid.child_coords()
    rows, valid = sp.lookup_rows(grid, cc)
    # padded (invalid) parent rows hold garbage coords that may alias real
    # parents — only rows under valid parents are meaningful.
    live = np.repeat(np.asarray(grid.pvalid), 8)
    np.testing.assert_array_equal(np.asarray(valid)[live], np.asarray(grid.cvalid)[live])
    act = np.asarray(rows)[live & np.asarray(valid)]
    exp = np.arange(grid.capacity)[live & np.asarray(grid.cvalid)]
    np.testing.assert_array_equal(act, exp)


def test_lookup_out_of_bounds_invalid():
    grid, _ = random_grid()
    bad = jnp.array([[-1, 0, 0], [0, grid.res, 0], [grid.res, grid.res, grid.res]])
    _, valid = sp.lookup_rows(grid, bad)
    assert not np.any(np.asarray(valid))


def test_sparse_trilinear_matches_dense():
    grid, storage = random_grid(res=8)
    dense = densify(grid, storage)
    # stay strictly inside so the reference border-clamp edge case is unused
    pts = jnp.asarray(RNG.uniform(-0.85, 0.85, size=(200, 3)).astype(np.float32))
    ours = sp.sparse_trilinear(grid, storage, pts)
    ref = trilinear_sample_3d(dense, pts, align_corners=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_sparse_trilinear_second_order_grads():
    grid, storage = random_grid(res=6)

    def f(p):
        return sp.sparse_trilinear(grid, storage, p[None])[0, 0]

    p0 = jnp.array([0.12, -0.3, 0.4])
    g = jax.grad(f)(p0)

    def eik(s):
        def f2(p):
            return sp.sparse_trilinear(grid, s, p[None])[0, 0]
        return jnp.sum(jax.grad(f2)(p0) ** 2)

    ds = jax.grad(eik)(storage)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.isfinite(np.asarray(ds)))


def test_scatter_to_dense_with_background():
    grid, storage = random_grid(res=8, c_feat=1)
    bg = jnp.asarray(RNG.randn(8, 8, 8, 1).astype(np.float32))
    out = np.asarray(sp.scatter_to_dense(grid, storage, background=bg))
    dense = np.asarray(densify(grid, storage))
    cv = np.zeros((8, 8, 8), bool)
    cc = np.asarray(grid.child_coords())
    for i, v in enumerate(np.asarray(grid.cvalid)):
        if v:
            cv[tuple(cc[i])] = True
    np.testing.assert_allclose(out[cv], dense[cv])
    np.testing.assert_allclose(out[~cv], np.asarray(bg)[~cv])


def test_occupancy_nearest():
    grid, _ = random_grid(res=8)
    cc = np.asarray(grid.child_coords())
    cv = np.asarray(grid.cvalid)
    centers = cc.astype(np.float32) * (2.0 / 7) - 1.0  # align_corners centers
    occ = np.asarray(sp.occupancy_nearest(grid, jnp.asarray(centers), align_corners=True))
    live = np.repeat(np.asarray(grid.pvalid), 8)  # padded rows alias coord 0
    np.testing.assert_array_equal(occ[live], cv[live])


def test_compact_parents():
    scores = jnp.array([3.0, 1.0, 5.0, 2.0, 4.0])
    pvalid = jnp.array([True, True, False, True, True])
    idx, valid = sp.compact_parents(scores, pvalid, 3)
    assert list(np.asarray(idx)) == [4, 0, 3]
    assert np.all(np.asarray(valid))
    # under-full: capacity > n valid
    idx2, valid2 = sp.compact_parents(scores, pvalid, 5)
    assert np.asarray(valid2).sum() == 4


def test_occupied_blocks_covers_all_occupancy():
    """Mesh-extraction block skipping must be exact: any lattice point with
    occupancy_nearest True (in ANY stage) lies in an occupied block."""
    grid_a, sa = random_grid(res=16, p_keep=0.2)
    grid_b, sb = random_grid(res=32, p_keep=0.1)
    stages = [(grid_a, sa), (grid_b, sb)]
    R, B = 48, 16
    occ_blocks = sp.occupied_blocks_host(stages, R, B)

    lin = np.linspace(-1, 1, R, dtype=np.float32)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel(), zs.ravel()], -1))
    m = np.zeros(R ** 3, bool)
    for g, _ in stages:
        m |= np.asarray(sp.occupancy_nearest(g, pts, align_corners=False))
    m = m.reshape(R, R, R)

    idx = np.arange(R) // B
    covered = occ_blocks[np.ix_(idx, idx, idx)]
    assert not (m & ~covered).any(), "occupied point in a skipped block"

    # clustered voxels (one octant) must leave far blocks skipped
    half = 8
    parents = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"),
                       -1).reshape(-1, 3).astype(np.int32)
    g = sp.make_grid(jnp.asarray(parents), jnp.ones(8, bool),
                     jnp.ones(64, bool), half * 2)
    occ2 = sp.occupied_blocks_host([(g, None)], R, B)
    assert occ2[0, 0, 0]
    assert not occ2[2, 2, 2]


def test_dense_storage_matches_sparse_trilinear():
    """The direct-indexed render path must reproduce the two-level sparse
    lookup exactly (f32) / to bf16 rounding (default)."""
    grid, storage = random_grid(res=16, p_keep=0.4)
    pts = jnp.asarray(RNG.uniform(-1.1, 1.1, (500, 3)).astype(np.float32))
    ref = np.asarray(sp.sparse_trilinear(grid, storage, pts))

    dense32 = sp.densify_storage(grid, storage, dtype=None)
    out32 = np.asarray(sp.sparse_trilinear(grid, dense32, pts))
    np.testing.assert_allclose(out32, ref, rtol=1e-6, atol=1e-6)

    dense16 = sp.densify_storage(grid, storage)  # bf16 default
    out16 = np.asarray(sp.sparse_trilinear(grid, dense16, pts))
    np.testing.assert_allclose(out16, ref, rtol=2e-2, atol=2e-2)

    # gradients flow back to the sparse rows through the scatter
    def f(s):
        return sp.sparse_trilinear(
            grid, sp.densify_storage(grid, s, dtype=None), pts).sum()

    g = np.asarray(jax.grad(f)(storage))
    g_ref = np.asarray(jax.grad(
        lambda s: sp.sparse_trilinear(grid, s, pts).sum())(storage))
    np.testing.assert_allclose(g, g_ref, rtol=1e-6, atol=1e-6)


def test_combined_occupancy_exact():
    """One folded occupancy volume == OR of per-stage nearest lookups."""
    grid_a, _ = random_grid(res=8, p_keep=0.3)
    grid_b, _ = random_grid(res=16, p_keep=0.15)
    grid_c, _ = random_grid(res=32, p_keep=0.05)
    grids = [grid_a, grid_b, grid_c]
    ov = sp.combined_occupancy(grids)
    assert ov.vol.shape == (32, 32, 32)

    pts = jnp.asarray(RNG.uniform(-1.2, 1.2, (5000, 3)).astype(np.float32))
    ref = np.zeros(5000, bool)
    for g in grids:
        ref |= np.asarray(sp.occupancy_nearest(g, pts, align_corners=False))
    out = np.asarray(sp.occupancy_lookup(ov, pts))
    np.testing.assert_array_equal(out, ref)


def test_dense_trilinear_oor_and_grads():
    """The channel-major dense lookup handles clamped borders and
    out-of-range points like the sparse path, and is differentiable."""
    grid, storage = random_grid(res=16, p_keep=0.5)
    dense = sp.densify_storage(grid, storage, dtype=None)
    pts = jnp.asarray(RNG.uniform(-1.3, 1.3, (800, 3)).astype(np.float32))
    ref = np.asarray(sp.sparse_trilinear(grid, storage, pts))
    out = np.asarray(sp.dense_trilinear(dense, pts))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # differentiable w.r.t. pts (the render takes grads through lookups)
    g = jax.grad(lambda p: sp.dense_trilinear(dense, p).sum())(pts)
    assert np.all(np.isfinite(np.asarray(g)))


def test_packed_trilinear_matches_dense():
    """Corner-packed lookup == dense lookup everywhere, including clamped
    borders and fully out-of-range points; ∂pts (1st and 2nd order via
    jvp-over-grad, the render's eikonal form) must also agree."""
    grid, storage = random_grid(res=16, p_keep=0.5)
    dense = sp.densify_storage(grid, storage, dtype=None)
    packed = sp.pack_storage(dense)
    assert packed.flat.shape == (8 * dense.C, (dense.res + 1) ** 3)
    pts = jnp.asarray(RNG.uniform(-1.6, 1.6, (800, 3)).astype(np.float32))
    ref = np.asarray(sp.dense_trilinear(dense, pts))
    out = np.asarray(sp.packed_trilinear(packed, pts))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # dispatch through sparse_trilinear
    out2 = np.asarray(sp.sparse_trilinear(grid, packed, pts))
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)

    def s_dense(p):
        return sp.dense_trilinear(dense, p).sum()

    def s_packed(p):
        return sp.packed_trilinear(packed, p).sum()

    g_ref, h_ref = jax.jvp(jax.grad(s_dense), (pts,), (jnp.ones_like(pts),))
    g_out, h_out = jax.jvp(jax.grad(s_packed), (pts,), (jnp.ones_like(pts),))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-5)


def test_pack_stages_gating():
    """pack_stages packs only stages whose packed copy fits the budget."""
    g1, s1 = random_grid(res=8, p_keep=0.6)
    g2, s2 = random_grid(res=16, p_keep=0.4)
    d1 = sp.densify_storage(g1, s1, dtype=None)
    d2 = sp.densify_storage(g2, s2, dtype=None)
    budget = 8 * d1.C * (d1.res + 1) ** 3 * 4  # exactly stage 1's bytes
    out = sp.pack_stages([(g1, d1), (g2, d2)], max_bytes=budget)
    assert isinstance(out[0][1], sp.PackedStorage)
    assert isinstance(out[1][1], sp.DenseStorage)


def test_packed_yz_trilinear_matches_dense():
    """yz 4-corner pack == dense lookup everywhere (clamped borders, fully
    out-of-range points); ∂pts to 2nd order (jvp-over-grad, the render's
    eikonal form) must also agree.  PERF_NOTES round-5 #2."""
    grid, storage = random_grid(res=16, p_keep=0.5)
    dense = sp.densify_storage(grid, storage, dtype=None)
    packed = sp.pack_storage_yz(dense)
    assert packed.flat.shape == (4 * dense.C,
                                 dense.res * (dense.res + 1) ** 2)
    pts = jnp.asarray(RNG.uniform(-1.6, 1.6, (800, 3)).astype(np.float32))
    ref = np.asarray(sp.dense_trilinear(dense, pts))
    out = np.asarray(sp.packed_trilinear_yz(packed, pts))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    out2 = np.asarray(sp.sparse_trilinear(grid, packed, pts))
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)

    def s_dense(p):
        return sp.dense_trilinear(dense, p).sum()

    def s_packed(p):
        return sp.packed_trilinear_yz(packed, p).sum()

    g_ref, h_ref = jax.jvp(jax.grad(s_dense), (pts,), (jnp.ones_like(pts),))
    g_out, h_out = jax.jvp(jax.grad(s_packed), (pts,), (jnp.ones_like(pts),))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    # 2nd-order values: the yz pack groups the x-pair before the yz lerps,
    # so fp32 summation order differs from the dense 8-corner path; observed
    # max |diff| 3.6e-5 on near-zero elements (values and 1st derivatives
    # match tightly above).  Tolerance scaled to the overall Hessian
    # magnitude rather than per-element (ADVICE r4).
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref),
                               rtol=1e-4,
                               atol=1e-4 * float(np.abs(h_ref).max()))


def test_pack_stages_yz_fallback():
    """Stages too big for the full pack take the yz pack when its budget
    allows; with max_bytes_yz=0 (default) behavior is unchanged."""
    g1, s1 = random_grid(res=8, p_keep=0.6)
    g2, s2 = random_grid(res=16, p_keep=0.4)
    d1 = sp.densify_storage(g1, s1, dtype=None)
    d2 = sp.densify_storage(g2, s2, dtype=None)
    budget = 8 * d1.C * (d1.res + 1) ** 3 * 4  # exactly stage 1's bytes
    out = sp.pack_stages([(g1, d1), (g2, d2)], max_bytes=budget)
    assert isinstance(out[1][1], sp.DenseStorage)
    yz_budget = 4 * d2.C * d2.res * (d2.res + 1) ** 2 * 4
    out2 = sp.pack_stages([(g1, d1), (g2, d2)], max_bytes=budget,
                          max_bytes_yz=yz_budget)
    assert isinstance(out2[0][1], sp.PackedStorage)
    assert isinstance(out2[1][1], sp.PackedStorageYZ)
