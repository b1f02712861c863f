"""Static-shape sparse voxel sets for the end-to-end sparsification cascade.

The reference represents each stage's active voxels as a data-dependent
torchsparse ``SparseTensor`` plus a dense int64 index table per stage
(volume.py:123-132 — at stage 3 that table is 704^3 int64!).  Neither is
XLA-friendly: shapes change every step and the table costs 2.8e9 entries.

TPU-native design used here (static shapes, bounded memory):

  * Voxels of a stage live in **parent blocks**: a stage at resolution R
    stores ``P`` parent cells at resolution R/2, each owning its 2x2x2
    children.  Upsampling a stage (volume.py:35-52) maps kept voxels of
    stage s-1 to parents of stage s, so the blocks arise naturally.
  * ``parent_table`` is a dense int32 grid at R/2 mapping parent coord ->
    parent row (or -1).  Even at stage 3 (R=704) this is only 352^3 int32
    = 174 MB, vs 11+ GB for a child-level table.
  * All buffers are capacity-padded with validity masks; "filtering" is a
    mask update + a top-k compaction, never a boolean index.

A voxel coordinate ``v`` (int, in [0, R)) resolves to:
    parent p = v >> 1,  child slot k = (v0&1)*4 + (v1&1)*2 + (v2&1)
    row = parent_table[p] * 8 + k,  valid iff parent_table[p] >= 0 and
    child_valid[row].

Feature storage for a stage is any ``(P * 8, C)`` array indexed by ``row``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# child slot offsets in the fixed order (x,y,z) bits — slot k corresponds to
# offset ((k>>2)&1, (k>>1)&1, k&1)
CHILD_OFFSETS = jnp.array(
    [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)], dtype=jnp.int32)


class VoxelGrid(NamedTuple):
    """Static-capacity sparse voxel set at resolution ``res`` (= 2 * parent
    resolution).  All arrays are capacity-padded.

    parents:     (P, 3) int32 parent coords at res//2 (garbage where ~pvalid)
    pvalid:      (P,)   bool
    cvalid:      (P*8,) bool   child validity (row-major by parent, slot)
    parent_table:(res//2, res//2, res//2) int32  parent coord -> row or -1
    """
    parents: jnp.ndarray
    pvalid: jnp.ndarray
    cvalid: jnp.ndarray
    parent_table: jnp.ndarray

    @property
    def res(self) -> int:
        return self.parent_table.shape[0] * 2

    @property
    def capacity(self) -> int:
        return self.parents.shape[0] * 8

    def child_coords(self):
        """(P*8, 3) int32 voxel coords of every child slot."""
        return (self.parents[:, None, :] * 2 + CHILD_OFFSETS[None]).reshape(-1, 3)


def build_parent_table(parents, pvalid, half_res: int):
    """Scatter parent rows into a dense int32 lookup grid."""
    n3 = half_res ** 3
    flat = jnp.full((n3 + 1,), -1, dtype=jnp.int32)
    p = jnp.clip(parents, 0, half_res - 1)
    idx = (p[:, 0] * half_res + p[:, 1]) * half_res + p[:, 2]
    idx = jnp.where(pvalid, idx, n3)  # invalid rows scatter to the dump slot
    rows = jnp.arange(parents.shape[0], dtype=jnp.int32)
    flat = flat.at[idx].set(rows, mode="drop")
    return flat[:n3].reshape(half_res, half_res, half_res)


def make_grid(parents, pvalid, cvalid, res: int) -> VoxelGrid:
    table = build_parent_table(parents, pvalid, res // 2)
    return VoxelGrid(parents, pvalid, cvalid.reshape(-1), table)


def dense_base_grid(res: int) -> VoxelGrid:
    """Fully dense stage-0 grid (reference: Volume.init_coords,
    volume.py:21-33) expressed in the same sparse structure: every parent at
    res//2 exists, every child valid."""
    half = res // 2
    r = jnp.arange(half, dtype=jnp.int32)
    parents = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    pvalid = jnp.ones((half ** 3,), dtype=bool)
    cvalid = jnp.ones((half ** 3 * 8,), dtype=bool)
    return make_grid(parents, pvalid, cvalid, res)


def lookup_rows(grid: VoxelGrid, coords):
    """Voxel coords (..., 3) int32 -> (rows (...,), valid (...,)).

    rows are clamped-safe for gathering; ``valid`` is False outside bounds,
    at absent parents, and at invalid child slots.
    """
    res = grid.res
    half = res // 2
    in_bounds = jnp.all((coords >= 0) & (coords < res), axis=-1)
    c = jnp.clip(coords, 0, res - 1)
    p = c >> 1
    k = ((c[..., 0] & 1) << 2) | ((c[..., 1] & 1) << 1) | (c[..., 2] & 1)
    pidx = (p[..., 0] * half + p[..., 1]) * half + p[..., 2]
    prow = grid.parent_table.reshape(-1)[pidx]
    row = jnp.clip(prow, 0) * 8 + k
    valid = in_bounds & (prow >= 0) & grid.cvalid[row]
    return row, valid


def gather_feats(storage, rows, valid):
    """storage (P*8, C); rows/valid (...,) -> (..., C), zero where invalid."""
    out = storage[rows.reshape(-1)].reshape(*rows.shape, storage.shape[-1])
    return out * valid[..., None].astype(storage.dtype)


@jax.tree_util.register_pytree_node_class
class DenseStorage:
    """Render-path alternative to the (P*8, C) row storage: the same
    features scattered into a direct-indexed CHANNEL-MAJOR (C, res^3)
    volume (zeros at inactive voxels; ``res`` rides the pytree aux data).

    Why channel-major: XLA's TPU gather kernel prefers the operand with
    the gathered axis minor and the offset window major — row-major
    (n3, C) operands get copied to exactly this form inside the graph
    (a 5.2 GB copy at 704^3), and any (n3, C<128) scatter OUTPUT pads C
    to the 128-lane tile (89 GB).  (C, n3) has compact default layouts
    for both the scatter and the gather, with no channel padding.

    The two-level sparse lookup costs 2 DEPENDENT gathers per corner
    (parent-table row, then storage row) — measured as the dominant term
    of the whole render at the 704^3 protocol (611 of 782 ms).  Direct
    indexing halves the gather count and breaks the dependency chain, at
    the price of materializing the dense volume (704^3 x 7ch bf16 =
    4.9 GB — affordable at validation/bench; training keeps the sparse
    rows)."""

    def __init__(self, flat, res):
        self.flat = flat          # (C, res**3)
        self.res = int(res)

    def tree_flatten(self):
        return (self.flat,), self.res

    @classmethod
    def tree_unflatten(cls, res, children):
        obj = cls.__new__(cls)
        obj.flat = children[0]
        obj.res = res
        return obj

    @property
    def C(self):
        return self.flat.shape[0]

    @property
    def vol(self):
        C = self.flat.shape[0]
        r = self.res
        return jnp.moveaxis(self.flat.reshape(C, r, r, r), 0, -1)


def densify_storage(grid: VoxelGrid, storage, dtype=jnp.bfloat16):
    """(P*8, C) rows -> DenseStorage for fast render-path lookups.
    Differentiable (scatter transpose routes gradients back to the rows).

    Jitted internally: called eagerly, the zeros init and the scatter
    would be separate dispatches and the 704^3 volume would exist TWICE
    (9.8 GB transient); one jit graph scatters in place."""
    dt = jnp.dtype(dtype or storage.dtype)
    return DenseStorage(_densify_jit(grid, storage, dt), grid.res)


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(2,))
def _densify_jit(grid, storage, dtype):
    res = grid.res
    n3 = res ** 3
    cc = grid.child_coords()
    col = (cc[:, 0] * res + cc[:, 1]) * res + cc[:, 2]
    col = jnp.where(grid.cvalid, col, n3)  # OOB -> dropped
    flat = jnp.zeros((storage.shape[-1], n3), dtype=dtype)
    return flat.at[:, col].set(storage.astype(dtype).T, mode="drop")


@jax.tree_util.register_pytree_node_class
class PackedStorage:
    """Corner-packed ``DenseStorage`` for the render/mesh hot path: flat
    (8C, (res+1)^3) channel-major, where row (i+1, j+1, k+1) holds the
    whole 2x2x2 window of the trilinear sample whose floor cell is
    (i, j, k), EDGE-padded so clamped-border semantics survive packing.
    ONE column gather fetches a sample's full footprint — 8x fewer gather
    descriptors than ``dense_trilinear`` (gather cost on TPU is per ROW,
    not per byte — docs/PERF_NOTES.md), at 8x the memory: only coarse
    stages are packed (see ``pack_stages``).  Value/∂pts path only (no
    custom transpose w.r.t. the volume): validation, bench and mesh
    extraction — training keeps the sparse rows."""

    def __init__(self, flat, res):
        self.flat = flat          # (8C, (res+1)**3)
        self.res = int(res)       # ORIGINAL resolution

    def tree_flatten(self):
        return (self.flat,), self.res

    @classmethod
    def tree_unflatten(cls, res, children):
        obj = cls.__new__(cls)
        obj.flat = children[0]
        obj.res = res
        return obj

    @property
    def C(self):
        return self.flat.shape[0] // 8


def pack_storage(storage: "DenseStorage") -> "PackedStorage":
    """DenseStorage (C, res^3) -> PackedStorage (8C, (res+1)^3)."""
    return PackedStorage(_pack_jit(storage.flat, storage.res), storage.res)


@_partial(jax.jit, static_argnums=(1,))
def _pack_jit(flat, res):
    C = flat.shape[0]
    vol = flat.reshape(C, res, res, res)
    p = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="edge")
    r1 = res + 1
    # corner order k = ox*4 + oy*2 + oz, matching dense_trilinear's loop
    packed = jnp.concatenate(
        [p[:, ox:r1 + ox, oy:r1 + oy, oz:r1 + oz]
         for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)], axis=0)
    return packed.reshape(8 * C, r1 ** 3)


def pack_stages(stages, max_bytes=750 * 2 ** 20, max_bytes_yz=0):
    """Corner-pack every DenseStorage stage whose packed copy fits in
    ``max_bytes`` (the coarse stages; 176^3 x 7ch bf16 packs to 621 MB,
    352^3 would be 4.9 GB).  Stages too big for the full 8-corner pack
    fall back to the yz 4-corner pack (2 gathers/sample, half the memory —
    352^3 x 7ch bf16 is 2.45 GB) when that fits ``max_bytes_yz``
    (0 = disabled; PERF_NOTES round-5 #2).  stages: [(grid, storage), ...]."""
    out = []
    for g, s in stages:
        if isinstance(s, DenseStorage):
            itemsize = s.flat.dtype.itemsize
            packed_bytes = 8 * s.C * (s.res + 1) ** 3 * itemsize
            yz_bytes = 4 * s.C * s.res * (s.res + 1) ** 2 * itemsize
            if packed_bytes <= max_bytes:
                s = pack_storage(s)
            elif yz_bytes <= max_bytes_yz:
                s = pack_storage_yz(s)
        out.append((g, s))
    return out


@jax.tree_util.register_pytree_node_class
class PackedStorageYZ:
    """yz-corner-packed ``DenseStorage``: flat (4C, res*(res+1)^2)
    channel-major, where row (x, j+1, k+1) holds the 2x2 yz window of
    voxel column x whose floor cell is (j, k), edge-padded in y/z for
    clamped-border semantics.  A trilinear sample gathers TWO rows (the
    x0 and x1 planes) instead of 8 — half the memory of the full
    8-corner ``PackedStorage`` for stages where that pack doesn't fit
    (PERF_NOTES round-5 #2).  Value/∂pts path only, like PackedStorage."""

    def __init__(self, flat, res):
        self.flat = flat          # (4C, res*(res+1)**2)
        self.res = int(res)

    def tree_flatten(self):
        return (self.flat,), self.res

    @classmethod
    def tree_unflatten(cls, res, children):
        obj = cls.__new__(cls)
        obj.flat = children[0]
        obj.res = res
        return obj

    @property
    def C(self):
        return self.flat.shape[0] // 4


def pack_storage_yz(storage: "DenseStorage") -> "PackedStorageYZ":
    """DenseStorage (C, res^3) -> PackedStorageYZ (4C, res*(res+1)^2)."""
    return PackedStorageYZ(_pack_yz_jit(storage.flat, storage.res),
                           storage.res)


@_partial(jax.jit, static_argnums=(1,))
def _pack_yz_jit(flat, res):
    C = flat.shape[0]
    vol = flat.reshape(C, res, res, res)
    p = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    r1 = res + 1
    # yz corner order k = oy*2 + oz, matching packed_trilinear's low bits
    packed = jnp.concatenate(
        [p[:, :, oy:r1 + oy, oz:r1 + oz] for oy in (0, 1) for oz in (0, 1)],
        axis=0)
    return packed.reshape(4 * C, res * r1 * r1)


def packed_trilinear_yz(ps: "PackedStorageYZ", pts):
    """Trilinear lookup from a PackedStorageYZ; numerically equal to
    ``dense_trilinear`` of the unpacked volume (clamped borders), two
    column gathers per sample.  Differentiable w.r.t. ``pts`` only."""
    res = ps.res
    r1 = res + 1
    flat = ps.flat
    C = flat.shape[0] // 4
    shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)
    coords = (p + 1.0) * 0.5 * (res - 1)
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = c0.astype(jnp.int32)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    # x corners clamp independently (the unpacked axis); the yz cell
    # clamps to [-1, res-1] like the full pack (edge padding covers it)
    x0 = jnp.clip(c0i[:, 0], 0, res - 1)
    x1 = jnp.clip(c0i[:, 0] + 1, 0, res - 1)
    cyz = jnp.clip(c0i[:, 1:], -1, res - 1) + 1
    base = cyz[:, 0] * r1 + cyz[:, 1]
    g0 = _gather_columns(flat, x0 * (r1 * r1) + base)  # (n, 4C)
    g1 = _gather_columns(flat, x1 * (r1 * r1) + base)
    out = None
    for k in range(4):
        oy, oz = (k >> 1) & 1, k & 1
        wyz = (fy if oy else gy) * (fz if oz else gz)
        v0 = jax.lax.slice_in_dim(g0, k * C, (k + 1) * C, axis=1)
        v1 = jax.lax.slice_in_dim(g1, k * C, (k + 1) * C, axis=1)
        term = (v0 * (gx * wyz)[:, None] + v1 * (fx * wyz)[:, None])
        out = term if out is None else out + term
    return out.reshape(*shape, C)


def packed_trilinear(ps: "PackedStorage", pts):
    """Trilinear lookup from a PackedStorage; numerically equal to
    ``dense_trilinear`` of the unpacked volume (clamped borders), one
    column gather per sample.  Differentiable w.r.t. ``pts`` (any order:
    the gathered rows are constants w.r.t. pts, only the lerp weights
    carry derivatives)."""
    res = ps.res
    r1 = res + 1
    flat = ps.flat
    C = flat.shape[0] // 8
    shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)
    coords = (p + 1.0) * 0.5 * (res - 1)
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = c0.astype(jnp.int32)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    # cell clamp to [-1, res-1] reproduces per-corner clamping exactly:
    # beyond that range every corner reads the same border voxel anyway
    ci = jnp.clip(c0i, -1, res - 1) + 1
    rows = (ci[:, 0] * r1 + ci[:, 1]) * r1 + ci[:, 2]
    g = _gather_columns(flat, rows)  # (n, 8C)
    out = None
    for k in range(8):
        ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        vals = jax.lax.slice_in_dim(g, k * C, (k + 1) * C, axis=1)
        w = (fx if ox else gx) * (fy if oy else gy) * (fz if oz else gz)
        term = vals * w[:, None]
        out = term if out is None else out + term
    return out.reshape(*shape, C)


def _gather_columns(flat, idx):
    """flat (C, M); idx (n,) -> (n, C) — the gathered axis minor, the
    channel window major: XLA's native TPU gather form."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(1,),
        start_index_map=(1,))
    out = jax.lax.gather(
        flat, idx[:, None].astype(jnp.int32), dn,
        slice_sizes=(flat.shape[0], 1),
        mode=jax.lax.GatherScatterMode.CLIP)
    return out


def dense_trilinear(storage: "DenseStorage", pts):
    """Trilinear lookup into a DenseStorage volume: one independent
    column gather per corner (clamped border semantics, matching the
    sparse path).  pts (..., 3) -> (..., C)."""
    res = storage.res
    flat = storage.flat
    C = flat.shape[0]
    shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)
    coords = (p + 1.0) * 0.5 * (res - 1)
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = c0.astype(jnp.int32)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz

    out = None
    for k in range(8):
        ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        cx = jnp.clip(c0i[:, 0] + ox, 0, res - 1)
        cy = jnp.clip(c0i[:, 1] + oy, 0, res - 1)
        cz = jnp.clip(c0i[:, 2] + oz, 0, res - 1)
        vals = _gather_columns(flat, (cx * res + cy) * res + cz)
        w = (fx if ox else gx) * (fy if oy else gy) * (fz if oz else gz)
        term = vals * w[:, None]
        out = term if out is None else out + term
    return out.reshape(*shape, C)


def sparse_trilinear(grid: VoxelGrid, storage, pts):
    """Sparse trilinear interpolation at world points in [-1, 1]^3.

    Functional equivalent of the reference's ``grid_sample_3d_sparse``
    (projector.py:217-374): voxel centers at ``-1 + 2*i/(res-1)``
    (align_corners=True convention), absent corner voxels contribute zero.
    Arbitrarily differentiable w.r.t. both ``storage`` and ``pts``.

    The 8 corners are UNROLLED rather than stacked on a trailing axis:
    stacked (n, 8, C) intermediates force TPU layouts with the 8/C axes on
    the 128-lane dimension (16x memory padding, and the second-order AD of
    the render materializes multi-GB [C, n, 8] temporaries); unrolled, every
    intermediate is (n, C) or (n,) and lays out compactly.

    NB: the reference clamps corner indices *before* the sparse lookup
    (projector.py:287-318), so out-of-range taps read the border voxel
    instead of zero; reproduced for weight compatibility.

    pts: (..., 3) -> (..., C)
    """
    if isinstance(storage, PackedStorage):
        return packed_trilinear(storage, pts)
    if isinstance(storage, PackedStorageYZ):
        return packed_trilinear_yz(storage, pts)
    if isinstance(storage, DenseStorage):
        # inactive voxels hold zero columns — same semantics as the
        # valid-gated sparse gather, in one independent gather per corner
        return dense_trilinear(storage, pts)

    res = grid.res
    coords = (pts + 1.0) * 0.5 * (res - 1)  # voxel-space
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = c0.astype(jnp.int32)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz

    out = None
    for k in range(8):
        ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        off = jnp.array([ox, oy, oz], dtype=jnp.int32)
        corner = jnp.clip(c0i + off, 0, res - 1)
        rows, valid = lookup_rows(grid, corner)
        vals = gather_feats(storage, rows, valid)          # (..., C)
        w = (fx if ox else gx) * (fy if oy else gy) * (fz if oz else gz)
        term = vals * w[..., None]
        out = term if out is None else out + term
    return out


@jax.tree_util.register_pytree_node_class
class OccupancyVolume:
    """Cross-stage nearest-occupancy folded into one dense bool volume at
    the finest stage resolution, kept FLAT (R^3,) so the gather never
    forces a layout-change copy.

    EXACT replacement for `any(occupancy_nearest(g, pts) for g in grids)`:
    every stage resolution divides the finest one, and the nearest-neighbor
    region of a voxel at res r is precisely the union of the (R/r)^3 fine
    regions it contains — so the OR can be precomputed once per scene and
    each point pays ONE gather instead of one per stage."""

    def __init__(self, flat, res):
        self.flat = flat          # (res**3,) bool
        self.res = int(res)

    def tree_flatten(self):
        return (self.flat,), self.res

    @classmethod
    def tree_unflatten(cls, res, children):
        obj = cls.__new__(cls)
        obj.flat = children[0]
        obj.res = res
        return obj

    @property
    def vol(self):
        return self.flat.reshape(self.res, self.res, self.res)


def _upsample_bool_x(occ3, f):
    """Nearest 3D upsampling of a bool grid by integer factor f, using only
    MAJOR-axis repeats (a minor-axis jnp.repeat broadcasts a (..., f) tiled
    intermediate whose 128-lane padding explodes 64x at 704^3; transposes
    are cheap bounded copies instead)."""
    r = occ3.shape[0]
    x = jnp.repeat(occ3.reshape(r, r * r), f, axis=0)         # expand x
    x = x.reshape(f * r * r, r)
    x = jnp.repeat(x, f, axis=0).reshape(f * r, f * r, r)     # expand y
    x = x.transpose(2, 0, 1).reshape(r, -1)                   # z major
    x = jnp.repeat(x, f, axis=0)                              # expand z
    return x.reshape(f * r, f * r, f * r).transpose(1, 2, 0)


def combined_occupancy(grids) -> OccupancyVolume:
    res_f = max(g.res for g in grids)
    acc = None
    for g in grids:
        r = g.res
        assert res_f % r == 0, "stage resolutions must divide the finest"
        cc = g.child_coords()
        idx = (cc[:, 0] * r + cc[:, 1]) * r + cc[:, 2]
        idx = jnp.where(g.cvalid, idx, r ** 3)  # OOB -> dropped
        occ = jnp.zeros((r ** 3,), bool).at[idx].set(True, mode="drop")
        f = res_f // r
        if f > 1:
            occ = _upsample_bool_x(occ.reshape(r, r, r), f).reshape(-1)
        acc = occ if acc is None else acc | occ
    return OccupancyVolume(acc, res_f)


def occupancy_lookup(ov: OccupancyVolume, pts):
    """Nearest-voxel occupancy (align_corners=False semantics, matching
    occupancy_nearest) in one gather."""
    R = ov.res
    coords = ((pts + 1.0) * R - 1.0) * 0.5
    idx = jnp.floor(coords + 0.5).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < R), axis=-1)
    c = jnp.clip(idx, 0, R - 1)
    return ov.flat[((c[..., 0] * R + c[..., 1]) * R + c[..., 2]).reshape(-1)
                   ].reshape(inside.shape) & inside


def occupancy_nearest(grid: VoxelGrid, pts, *, align_corners=False):
    """Nearest-voxel occupancy test at world points in [-1,1]^3.

    Equivalent to the reference's dense mask-volume nearest lookup
    (implicit_surface.py:86: lookup_volume(mask_volumes, 'nearest')) but
    reads the sparse structure directly — no dense (R^3) mask volume is ever
    materialized.  F.grid_sample's nearest mode with align_corners=False
    unnormalizes as ((c+1)*R - 1)/2 then truncates toward floor(+0.5).
    """
    res = grid.res
    if align_corners:
        coords = (pts + 1.0) * 0.5 * (res - 1)
    else:
        coords = ((pts + 1.0) * res - 1.0) * 0.5
    idx = jnp.floor(coords + 0.5).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < res), axis=-1)
    _, valid = lookup_rows(grid, jnp.clip(idx, 0, res - 1))
    return valid & inside


def scatter_to_dense(grid: VoxelGrid, values, *, background=None):
    """Scatter per-child values into a dense (res, res, res, C) volume.

    Reference equivalent: ``Volume.sparse2dense`` (volume.py:99-121) — used
    to build the dense matching (density) volume each stage, with the
    trilinearly-upsampled previous stage as background for channel 0.
    Invalid children are dropped.
    """
    res = grid.res
    C = values.shape[-1]
    cc = grid.child_coords()
    # 4-D index scatter with invalid children pushed out of bounds
    # (dropped): flat (n3, C) scatter outputs get copied to a lane-padded
    # layout in AD contexts (up to 8-16x memory at fine stages)
    x = jnp.where(grid.cvalid, cc[:, 0], res)
    if background is None:
        vol = jnp.zeros((res, res, res, C), dtype=values.dtype)
    else:
        vol = background
    return vol.at[x, cc[:, 1], cc[:, 2]].set(
        values.reshape(-1, C), mode="drop")


def compact_parents(scores, pvalid, capacity: int):
    """Select up to ``capacity`` parents by descending score (valid first).

    Replaces data-dependent boolean filtering (volume.py:165-167) with a
    static top-k: returns (sel_idx (capacity,), sel_valid (capacity,)).
    When the number of valid parents is <= capacity the selection is exactly
    the valid set; on overflow the lowest-scoring parents are dropped.
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(pvalid, scores, neg_inf)
    k = min(capacity, s.shape[0])  # fewer candidates than capacity is fine
    top_scores, sel_idx = jax.lax.top_k(s, k)
    sel_valid = top_scores > neg_inf
    if k < capacity:
        pad = capacity - k
        sel_idx = jnp.concatenate([sel_idx, jnp.zeros(pad, sel_idx.dtype)])
        sel_valid = jnp.concatenate([sel_valid, jnp.zeros(pad, bool)])
    return sel_idx.astype(jnp.int32), sel_valid


def occupied_blocks_host(stages, grid_res: int, block: int):
    """Host-side map of which ``block``^3 tiles of a ``grid_res``^3 sample
    lattice over [-1,1]^3 can contain active voxels.

    ``occupancy_nearest`` (align_corners=False) maps sample point p to voxel
    v iff p ∈ [2v/res - 1, (2v+2)/res - 1); in lattice-index units
    (i = (p+1)(R-1)/2) voxel v covers i ∈ [v(R-1)/res, (v+1)(R-1)/res].
    A tile no active voxel covers evaluates to the pinned empty-space SDF
    (+100) for every point, so mesh extraction can skip it exactly.

    stages: list of (VoxelGrid, storage).  Returns (nb, nb, nb) bool.
    """
    import numpy as np
    R, B = int(grid_res), int(block)
    nb = -(-R // B)
    occ = np.zeros((nb, nb, nb), dtype=bool)
    for grid, _ in stages:
        res = grid.res
        cc = np.asarray(grid.child_coords())
        cv = np.asarray(grid.cvalid)
        cc = cc[cv]
        if cc.size == 0:
            continue
        lo = np.clip((cc.astype(np.int64) * (R - 1)) // res // B, 0, nb - 1)
        hi = np.clip(((cc.astype(np.int64) + 1) * (R - 1)) // res // B,
                     0, nb - 1)
        # mark the FULL lo..hi block range per axis: a voxel's lattice
        # footprint spans span+1 blocks along an axis when (R-1)/res > B
        # (coarse grids at small block sizes) — corner-only marking would
        # skip interior blocks
        span = int((hi - lo).max()) if hi.size else 0
        for dx in range(span + 1):
            bx = np.minimum(lo[:, 0] + dx, hi[:, 0])
            for dy in range(span + 1):
                by = np.minimum(lo[:, 1] + dy, hi[:, 1])
                for dz in range(span + 1):
                    occ[bx, by, np.minimum(lo[:, 2] + dz, hi[:, 2])] = True
    return occ


def voxel_centers_world(coords, res: int):
    """Voxel integer coords -> world centers in [-1,1]^3 (volume.py:64:
    world = coords * voxel_size + origin, voxel_size = 2/(res-1))."""
    voxel_size = 2.0 / (res - 1)
    return coords.astype(jnp.float32) * voxel_size - 1.0
