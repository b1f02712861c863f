"""Sparse 3D cost-regularization U-Net (per cascade stage).

Functional re-design of the reference's torchsparse network
(models/modules/reg_network.py:38-107): conv0 -> three stride-2 encoder
levels (d_base * {1,2,4,8}) -> three transposed-conv decoder levels with
additive skips -> bias-free linear head.  Returns ``(out, mid)`` where
``out[..., :1]`` feeds the matching field and ``out[..., 1:]`` the feature
volume, and ``mid`` seeds the next stage's upsampled features (surf.py:115).

Two execution paths with identical semantics (tested against each other):

  * **dense**: densify the active set into a (R, R, R, C) volume and run
    XLA convolutions with per-level activity masks.  Masking after every
    block + masked batch-norm statistics makes this *exactly* submanifold:
    absent neighbors contribute zero and stats cover active voxels only.
    Used for coarse stages (R <= dense_max_res) where dense volumes are
    small — these map straight onto the MXU.
  * **hybrid**: at fine resolutions (352^3 / 704^3) the two finest U-Net
    levels run as gather/scatter convolutions over the capacity-padded
    voxel lists (27 neighbor gathers + channel matmuls, resolved through
    the VoxelGrid parent table); levels at R/4 and below densify.

All level geometry follows torchsparse's convention: a stride-2 conv's
output set is ``unique(coords // 2)`` and its transposed counterpart maps
back to the exact pre-downsample set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import (
    conv3d_init, conv3d_apply, conv3d_transpose_apply,
    batch_norm_init, masked_batch_norm_apply, relu,
)
from ..ops import sparse as sp

_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
# all 27 taps stacked: gathers happen in ONE call and the contraction is a
# single (N, 27*C) x (27*C, Cout) matmul on the MXU
_OFFSETS_ARR = jnp.array(_OFFSETS, jnp.int32)           # (27, 3)


def _w_flat(w):
    """(3,3,3,Cin,Cout) -> (27*Cin, Cout), tap-major to match _OFFSETS_ARR."""
    return w.reshape(27 * w.shape[3], w.shape[4])


import os as _os

# bounds the (chunk, 27, C) gather temp; tunable because the full-protocol
# staged backward runs within ~1 GB of the HBM ceiling (131072 OOMs the
# stage-3 backward by ~270 MB on a 16 GB v5e; 65536 fits with the same
# steady-state step time)
_CHUNK_ROWS = int(_os.environ.get("SURF_CONV_CHUNK", 65536))


# ---------------------------------------------------------------------------
# neighbor-table gathers
#
# The two-level child lookup (parent-table gather from an (R/2)^3 flat table
# at ~13.4 ns/row + validity gather + storage row gather) dominates the
# U-Net cost at fine stages (measured: stage-3 fwd 9.6 s, fwd+vjp 29.5 s).
# Since a child's 27 neighbors live in its parent's 3^3 parent neighborhood,
# ONE (P, 27) neighbor-row table per stage turns every tap into a single
# arithmetic-indexed storage gather:
#
#   child row r = 8p + slot k;  neighbor at offset off:
#     parent delta d = floor((k_axis + off_axis)/2)   — STATIC per (k, off)
#     child slot  s' = (k_axis + off_axis) & 1        — STATIC per (k, off)
#     row = nbr[p, tap(d)] * 8 + s'   (negative when the parent is missing)
#
# Missing neighbors read as zero via mode="fill" (invalid child rows already
# hold zeros: every conv input is validity-masked).
# ---------------------------------------------------------------------------

import numpy as _np

_OFFSETS_NP = _np.array(_OFFSETS, _np.int32)


def _tap_index(d):
    return (d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1)


def _build_subm_child_map():
    """(8, 27, 2): for child slot k and tap t -> (parent tap index, slot')."""
    m = _np.zeros((8, 27, 2), _np.int32)
    for k in range(8):
        kb = [(k >> 2) & 1, (k >> 1) & 1, k & 1]
        for t, off in enumerate(_OFFSETS):
            d, s2 = [], 0
            for a in range(3):
                v = kb[a] + off[a]
                d.append((v - (v & 1)) // 2)
                s2 = (s2 << 1) | (v & 1)
            m[k, t] = (_tap_index(d), s2)
    return m


def _build_down_map():
    """(27, 2): child at 2p+off -> (parent tap index, slot)."""
    m = _np.zeros((27, 2), _np.int32)
    for t, off in enumerate(_OFFSETS):
        d, s2 = [], 0
        for a in range(3):
            v = off[a]
            d.append((v - (v & 1)) // 2)
            s2 = (s2 << 1) | (v & 1)
        m[t] = (_tap_index(d), s2)
    return m


def _build_up_map():
    """Per child slot k: the taps with (k - off) even per axis (the only
    contributors of a transposed stride-2 conv) -> (t, parent tap index)."""
    out = []
    for k in range(8):
        kb = [(k >> 2) & 1, (k >> 1) & 1, k & 1]
        taps = []
        for t, off in enumerate(_OFFSETS):
            d = []
            ok = True
            for a in range(3):
                v = kb[a] - off[a]
                if v & 1:
                    ok = False
                    break
                d.append(v // 2)
            if ok:
                taps.append((t, _tap_index(d)))
        out.append(_np.array(taps, _np.int32))
    return out


def _build_box64_maps():
    """The 216 (slot, tap) child references of a parent hit only the 64
    distinct children at 2p + d, d in {-1,0,1,2}^3 — a 4^3 box.  Gathering
    the box ONCE per parent cuts the child-conv gather bytes 216/64 = 3.4x;
    the per-slot tap selection then happens inside the weight tensor.

    Returns (dmap (64,) parent-tap, smap (64,) slot', sel (8, 27) box index
    of child-slot k's tap-t neighbor)."""
    ds = (-1, 0, 1, 2)
    dmap = _np.zeros(64, _np.int32)
    smap = _np.zeros(64, _np.int32)
    for j, (dx, dy, dz) in enumerate(
            (a, b, c) for a in ds for b in ds for c in ds):
        pd, s2 = [], 0
        for v in (dx, dy, dz):
            pd.append((v - (v & 1)) // 2)
            s2 = (s2 << 1) | (v & 1)
        dmap[j] = _tap_index(pd)
        smap[j] = s2
    sel = _np.zeros((8, 27), _np.int32)
    for k in range(8):
        kb = [(k >> 2) & 1, (k >> 1) & 1, k & 1]
        for t, off in enumerate(_OFFSETS):
            d = [kb[a] + off[a] for a in range(3)]          # in {-1,0,1,2}
            sel[k, t] = (ds.index(d[0]) * 4 + ds.index(d[1])) * 4 \
                + ds.index(d[2])
    return dmap, smap, sel


def _build_up_t27(up_map):
    """(8, 27): for child slot k and PARENT tap d -> kernel tap t, or 27
    (selects a zero weight row) where no tap of the transposed stride-2
    conv maps there.  For fixed (k, d) the contributing t is unique."""
    u = _np.full((8, 27), 27, _np.int32)
    for k, taps in enumerate(up_map):
        for t, d in taps:
            u[k, d] = t
    return u


_SUBM_CHILD_MAP = _build_subm_child_map()
_DOWN_MAP = _build_down_map()
_UP_MAP = _build_up_map()
_BOX64_DMAP, _BOX64_SMAP, _BOX64_SEL = _build_box64_maps()
_UP_T27 = _build_up_t27(_UP_MAP)


def parent_neighbor_rows(grid):
    """(P, 27) int32: row of each parent's 3^3 neighborhood (-1 = missing).
    Computed once per stage and shared by every conv + transpose + dW."""
    half = grid.res // 2
    nb = grid.parents[:, None, :] + _OFFSETS_ARR            # (P, 27, 3)
    inb = jnp.all((nb >= 0) & (nb < half), axis=-1)
    c = jnp.clip(nb, 0, half - 1)
    idx = (c[..., 0] * half + c[..., 1]) * half + c[..., 2]
    prow = grid.parent_table.reshape(-1)[idx.reshape(-1)].reshape(idx.shape)
    return jnp.where(inb, prow, -1)


def _take_rows(storage, idx):
    """Row gather with zero fill for missing (negative) indices.

    NB: mode="fill" only fills indices >= n — NEGATIVE indices wrap
    python-style — so misses are redirected past the end first."""
    idx = jnp.where(idx < 0, storage.shape[0], idx)
    return jnp.take(storage, idx, axis=0, mode="fill", fill_value=0)


def _chunked_parents(fn, n_parents, out_child=False):
    """lax.map fn over parent-row chunks; fn(rows) -> (n, 8, C) if out_child
    else (n, C)."""
    cr = _CHUNK_ROWS // (8 if out_child else 1)
    if n_parents <= cr:
        out = fn(jnp.arange(n_parents, dtype=jnp.int32))
        return out.reshape(-1, out.shape[-1])
    n_chunks = -(-n_parents // cr)
    idx = jnp.arange(n_chunks * cr, dtype=jnp.int32).reshape(n_chunks, cr)
    idx = jnp.minimum(idx, n_parents - 1)
    out = jax.lax.map(fn, idx)
    return out.reshape(-1, out.shape[-1])[: n_parents * (8 if out_child else 1)]


def _chunked_rows(fn, n_rows):
    """Apply fn over row chunks via lax.map: same result as fn(arange(n)),
    but the (chunk, 27, C) stacked-tap temporaries live one chunk at a time
    (an unchunked gather at fine stages is several GB per conv and OOMs)."""
    if n_rows <= _CHUNK_ROWS:
        return fn(jnp.arange(n_rows, dtype=jnp.int32))
    n_chunks = -(-n_rows // _CHUNK_ROWS)
    pad = n_chunks * _CHUNK_ROWS - n_rows
    idx = jnp.arange(n_chunks * _CHUNK_ROWS, dtype=jnp.int32).reshape(
        n_chunks, _CHUNK_ROWS)
    idx = jnp.minimum(idx, n_rows - 1)
    # remat: without it lax.map stacks every chunk's gather residuals for
    # the backward pass, recreating the unchunked memory footprint
    out = jax.lax.map(jax.checkpoint(fn), idx)
    return out.reshape(n_chunks * _CHUNK_ROWS, -1)[:n_rows]


# ---------------------------------------------------------------------------
# neighbor-table conv kernels (raw)
# ---------------------------------------------------------------------------


def _box64_rows(storage, nbr, rows):
    """The 4^3 distinct-children box of each parent in ONE take: (n, 64, C).
    216/64 = 3.4x fewer gather bytes than per-(slot, tap) references."""
    C = storage.shape[-1]
    dmap = jnp.asarray(_BOX64_DMAP)                         # (64,)
    smap = jnp.asarray(_BOX64_SMAP)
    nk = nbr[rows][:, dmap]                                 # (n, 64)
    idx = jnp.where(nk >= 0, nk * 8 + smap, -1)
    return _take_rows(storage, idx.reshape(-1)).reshape(*idx.shape, C)


def _subm_w64(w):
    """(64*Cin, 8*Cout): per-slot tap weights scattered onto the 64-box
    (W2[j -> (k, t): SEL[k, t] = j])."""
    C, Co = w.shape[3], w.shape[4]
    w27 = w.reshape(27, C, Co)
    w2 = jnp.zeros((8, 64, C, Co), w.dtype)
    k_idx = _np.repeat(_np.arange(8), 27)
    w2 = w2.at[k_idx, _BOX64_SEL.reshape(-1)].set(jnp.tile(w27, (8, 1, 1, 1)
                                                           ).reshape(216, C, Co))
    return w2.transpose(1, 2, 0, 3).reshape(64 * C, 8 * Co)


def _subm_child_nbr_raw(w, storage, nbr, cvalid):
    """Submanifold conv at child level via the 64-box gather."""
    C, Co = w.shape[3], w.shape[4]
    w64 = _subm_w64(w)

    def chunk_fn(rows):
        x = _box64_rows(storage, nbr, rows)                 # (n, 64, C)
        n = x.shape[0]
        return (x.reshape(n, 64 * C) @ w64).reshape(n, 8, Co)

    out = _chunked_parents(chunk_fn, nbr.shape[0], out_child=True)
    return out * cvalid[:, None].astype(out.dtype)


def _subm_parent_nbr_raw(w, storage_p, nbr, pactive):
    wf = _w_flat(w)
    C = storage_p.shape[-1]

    def chunk_fn(rows):
        idx = nbr[rows]                                     # (n, 27)
        x = _take_rows(storage_p, idx.reshape(-1)).reshape(
            idx.shape[0], 27 * C)
        return x @ wf

    out = _chunked_parents(chunk_fn, nbr.shape[0])
    return out * pactive[:, None].astype(out.dtype)


def _down_c2p_nbr_raw(w, storage, nbr):
    """Stride-2 conv children -> parents via the neighbor table."""
    wf = _w_flat(w)
    C = storage.shape[-1]
    dmap = jnp.asarray(_DOWN_MAP[:, 0])
    smap = jnp.asarray(_DOWN_MAP[:, 1])

    def chunk_fn(rows):
        nk = nbr[rows][:, dmap]                             # (n, 27)
        idx = jnp.where(nk >= 0, nk * 8 + smap, -1)
        x = _take_rows(storage, idx.reshape(-1)).reshape(
            idx.shape[0], 27 * C)
        return x @ wf

    return _chunked_parents(chunk_fn, nbr.shape[0])


def _up_w27(w):
    """(27*C, 8*Cout): transposed-conv weights laid out per PARENT tap d —
    W2[d, :, k, :] = w[t(k, d)] (zero where no kernel tap maps), so the
    up-conv gathers only the 27 parent rows each parent chunk shares."""
    C, Co = w.shape[3], w.shape[4]
    w28 = jnp.concatenate(
        [w.reshape(27, C, Co), jnp.zeros((1, C, Co), w.dtype)])
    w2 = w28[jnp.asarray(_UP_T27)]                          # (8, 27, C, Co)
    return w2.transpose(1, 2, 0, 3).reshape(27 * C, 8 * Co)


def _up_p2c_nbr_raw(w, storage_p, nbr, cvalid):
    """Transposed stride-2 conv parents -> children: per child slot only the
    statically-even taps contribute (<= 8 of 27); gathers the shared 27
    parent rows once per parent."""
    C, Co = w.shape[3], w.shape[4]
    w27 = _up_w27(w)

    def chunk_fn(rows):
        idx = nbr[rows]                                     # (n, 27)
        x = _take_rows(storage_p, idx.reshape(-1)).reshape(
            idx.shape[0], 27 * C)
        return (x @ w27).reshape(-1, 8, Co)

    out = _chunked_parents(chunk_fn, nbr.shape[0], out_child=True)
    return out * cvalid[:, None].astype(out.dtype)


def _dw_accum(chunk_fn, n_parents):
    """Sum chunk_fn(raw_parent_rows) -> (27, Cin, Cout) over parent chunks.
    chunk_fn receives UNCLAMPED rows (possibly >= n_parents): it must clamp
    for indexing and zero padded rows' cotangents via _pad_mask."""
    cr = _CHUNK_ROWS // 8
    if n_parents <= cr:
        return chunk_fn(jnp.arange(n_parents, dtype=jnp.int32))
    n_chunks = -(-n_parents // cr)
    idx = jnp.arange(n_chunks * cr, dtype=jnp.int32).reshape(n_chunks, cr)
    return jnp.sum(jax.lax.map(chunk_fn, idx), axis=0)


def _pad_mask(rows, n_parents):
    return (rows < n_parents)[:, None].astype(jnp.float32)


def _make_pad_safe_ct(ct):
    """ct reshaped to (P, 8, Cout) for slot indexing."""
    return ct.reshape(-1, 8, ct.shape[-1])


@jax.custom_vjp
def subm_conv_child_nbr(w, storage, nbr, cvalid):
    return _subm_child_nbr_raw(w, storage, nbr, cvalid)


def _scc_fwd(w, storage, nbr, cvalid):
    return subm_conv_child_nbr(w, storage, nbr, cvalid), \
        (w, storage, nbr, cvalid)


def _scc_bwd(res, ct):
    w, storage, nbr, cvalid = res
    ct = ct * cvalid[:, None].astype(ct.dtype)
    dx = _subm_child_nbr_raw(_flipT(w), ct, nbr, cvalid)
    ct8 = _make_pad_safe_ct(ct)
    n_parents = nbr.shape[0]

    C, Co = w.shape[3], w.shape[4]

    def chunk(rows):
        pm = _pad_mask(rows, n_parents)
        rc = jnp.minimum(rows, n_parents - 1)
        x = _box64_rows(storage, nbr, rc)                   # (n, 64, C)
        ctk = ct8[rc] * pm[:, :, None]                      # (n, 8, Cout)
        n = x.shape[0]
        # M[j, c, k, o] = sum_n x64 ct: one MXU matmul per chunk; the
        # (slot, tap) -> box-index contraction happens once afterwards
        return x.reshape(n, 64 * C).T @ ctk.reshape(n, 8 * Co)

    M = _dw_accum(chunk, n_parents).reshape(64, C, 8, Co)
    dw = jnp.zeros((27, C, Co), w.dtype)
    for k in range(8):
        dw = dw + M[jnp.asarray(_BOX64_SEL[k]), :, k, :]
    return _shape_dw(dw, w), dx, None, None


subm_conv_child_nbr.defvjp(_scc_fwd, _scc_bwd)


@jax.custom_vjp
def subm_conv_parent_nbr(w, storage_p, nbr, pactive):
    return _subm_parent_nbr_raw(w, storage_p, nbr, pactive)


def _scp_fwd(w, storage_p, nbr, pactive):
    return subm_conv_parent_nbr(w, storage_p, nbr, pactive), \
        (w, storage_p, nbr, pactive)


def _scp_bwd(res, ct):
    w, storage_p, nbr, pactive = res
    ct = ct * pactive[:, None].astype(ct.dtype)
    dx = _subm_parent_nbr_raw(_flipT(w), ct, nbr, pactive)
    n_parents = nbr.shape[0]
    C = storage_p.shape[-1]

    def chunk(rows):
        rc = jnp.minimum(rows, n_parents - 1)
        idx = nbr[rc]
        x = _take_rows(storage_p, idx.reshape(-1)).reshape(*idx.shape, C)
        ctk = ct[rc] * _pad_mask(rows, n_parents)
        return jnp.einsum("ntc,no->tco", x, ctk)

    dw = _shape_dw(_dw_accum(chunk, n_parents), w)
    return dw, dx, None, None


subm_conv_parent_nbr.defvjp(_scp_fwd, _scp_bwd)


@jax.custom_vjp
def down_conv_c2p_nbr(w, storage, nbr, pactive, cvalid):
    # pactive/cvalid gate the backward only (outputs masked downstream)
    return _down_c2p_nbr_raw(w, storage, nbr)


def _dcp_fwd(w, storage, nbr, pactive, cvalid):
    return down_conv_c2p_nbr(w, storage, nbr, pactive, cvalid), \
        (w, storage, nbr, pactive, cvalid)


def _dcp_bwd(res, ct):
    w, storage, nbr, pactive, cvalid = res
    ct = ct * pactive[:, None].astype(ct.dtype)
    dx = _up_p2c_nbr_raw(_T(w), ct, nbr, cvalid)
    n_parents = nbr.shape[0]
    C = storage.shape[-1]
    dmap = jnp.asarray(_DOWN_MAP[:, 0])
    smap = jnp.asarray(_DOWN_MAP[:, 1])

    def chunk(rows):
        rc = jnp.minimum(rows, n_parents - 1)
        nk = nbr[rc][:, dmap]
        idx = jnp.where(nk >= 0, nk * 8 + smap, -1)
        x = _take_rows(storage, idx.reshape(-1)).reshape(*idx.shape, C)
        ctk = ct[rc] * _pad_mask(rows, n_parents)
        return jnp.einsum("ntc,no->tco", x, ctk)

    dw = _shape_dw(_dw_accum(chunk, n_parents), w)
    return dw, dx, None, None, None


down_conv_c2p_nbr.defvjp(_dcp_fwd, _dcp_bwd)


@jax.custom_vjp
def up_conv_p2c_nbr(w, storage_p, nbr, cvalid, pactive):
    return _up_p2c_nbr_raw(w, storage_p, nbr, cvalid)


def _upc_fwd(w, storage_p, nbr, cvalid, pactive):
    return up_conv_p2c_nbr(w, storage_p, nbr, cvalid, pactive), \
        (w, storage_p, nbr, cvalid, pactive)


def _upc_bwd(res, ct):
    w, storage_p, nbr, cvalid, pactive = res
    ct = ct * cvalid[:, None].astype(ct.dtype)
    dx = _down_c2p_nbr_raw(_T(w), ct, nbr) \
        * pactive[:, None].astype(ct.dtype)
    ct8 = _make_pad_safe_ct(ct)
    n_parents = nbr.shape[0]
    C = storage_p.shape[-1]

    Co = w.shape[4]

    def chunk(rows):
        rc = jnp.minimum(rows, n_parents - 1)
        pm = _pad_mask(rows, n_parents)
        idx = nbr[rc]                                       # (n, 27)
        x = _take_rows(storage_p, idx.reshape(-1)).reshape(
            idx.shape[0], 27 * C)
        ctk = ct8[rc] * pm[:, :, None]                      # (n, 8, Cout)
        return x.T @ ctk.reshape(-1, 8 * Co)                # (27C, 8Co)

    M = _dw_accum(chunk, n_parents).reshape(27, C, 8, Co)
    # route M[d, :, k, :] to kernel tap t = _UP_T27[k, d]; t = 27 (no tap
    # of the transposed conv maps there) drops
    dw28 = jnp.zeros((28, C, Co), w.dtype)
    dw28 = dw28.at[jnp.asarray(_UP_T27).reshape(-1)].add(
        M.transpose(2, 0, 1, 3).reshape(8 * 27, C, Co))
    return _shape_dw(dw28[:27], w), dx, None, None, None


up_conv_p2c_nbr.defvjp(_upc_fwd, _upc_bwd)


# ---------------------------------------------------------------------------
# custom VJPs for the gather convolutions
#
# XLA's autodiff of a gather is a scatter-add — at stage-3 capacity that is
# ~84M serialized scatter-adds into multi-GB tables per conv, the dominant
# term of the 57 s stage-3 backward (round-2 finding).  But every sparse
# conv's input-transpose is ANOTHER sparse conv from the same family:
#
#   subm conv            <->  subm conv, kernel spatially flipped + C-transposed
#   stride-2 down conv   <->  stride-2 up (transposed) conv, C-transposed
#   parents -> dense     <->  dense -> parents,              C-transposed
#
# (out[i] = sum_off w[off] x[n(i,off)]  =>  dx[j] = sum_off w'[off] ct[m(j,off)]
# with the adjacency inverted — still a gather because voxel->row is a
# bijection.)  The weight gradient needs one extra gather pass of the saved
# input.  So each conv's backward costs ~2 forward passes of GATHERS and
# matmuls — no scatters, no per-chunk rematerialization.
# ---------------------------------------------------------------------------


def _flipT(w):
    """Transpose kernel for submanifold convs: spatial flip + channel swap."""
    return jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)


def _T(w):
    """Transpose kernel for stride-2 down/up convs (no spatial flip: the
    down/up index relations c = 2q + off are already mutual inverses)."""
    return w.transpose(0, 1, 2, 4, 3)


def _dw_chunked(gather27_fn, ct, n_rows):
    """dW = sum_i X27[i]^T ct[i]  ->  (27, Cin, Cout), row-chunked.

    gather27_fn(rows) -> (n, 27, Cin) must be the conv's forward gather.
    Padded rows (row clamped to n_rows-1) contribute zero via zero-padded ct.
    """
    if n_rows <= _CHUNK_ROWS:
        x = gather27_fn(jnp.arange(n_rows, dtype=jnp.int32))
        return jnp.einsum("ntc,no->tco", x, ct)
    n_chunks = -(-n_rows // _CHUNK_ROWS)
    pad = n_chunks * _CHUNK_ROWS - n_rows
    ct_p = jnp.concatenate(
        [ct, jnp.zeros((pad, ct.shape[-1]), ct.dtype)]) if pad else ct
    idx = jnp.arange(n_chunks * _CHUNK_ROWS, dtype=jnp.int32).reshape(
        n_chunks, _CHUNK_ROWS)

    def chunk(rows):
        x = gather27_fn(jnp.minimum(rows, n_rows - 1))
        return jnp.einsum("ntc,no->tco", x, ct_p[rows])

    return jnp.sum(jax.lax.map(chunk, idx), axis=0)


def _shape_dw(dw_flat, w):
    return dw_flat.reshape(w.shape)


# -- submanifold conv at child level ----------------------------------------

@jax.custom_vjp
def subm_conv_child(w, storage, grid):
    return _subm_conv_child({"w": w}, grid, storage)


def _subm_child_fwd(w, storage, grid):
    return subm_conv_child(w, storage, grid), (w, storage, grid)


def _subm_child_bwd(res, ct):
    w, storage, grid = res
    ct = ct * grid.cvalid[:, None].astype(ct.dtype)
    dx = _subm_conv_child({"w": _flipT(w)}, grid, ct)
    cc = grid.child_coords()

    def g27(rows):
        return _child_gather(grid, storage, cc[rows][:, None, :] + _OFFSETS_ARR)

    dw = _shape_dw(_dw_chunked(g27, ct, cc.shape[0]), w)
    return dw, dx, None


subm_conv_child.defvjp(_subm_child_fwd, _subm_child_bwd)


# -- submanifold conv at parent level ---------------------------------------

@jax.custom_vjp
def subm_conv_parent(w, storage_p, grid, pactive):
    return _subm_conv_parent({"w": w}, grid, storage_p, pactive)


def _subm_parent_fwd(w, storage_p, grid, pactive):
    return subm_conv_parent(w, storage_p, grid, pactive), \
        (w, storage_p, grid, pactive)


def _subm_parent_bwd(res, ct):
    w, storage_p, grid, pactive = res
    ct = ct * pactive[:, None].astype(ct.dtype)
    dx = _subm_conv_parent({"w": _flipT(w)}, grid, ct, pactive)

    def g27(rows):
        return _parent_gather(grid, storage_p,
                              grid.parents[rows][:, None, :] + _OFFSETS_ARR,
                              pactive)

    dw = _shape_dw(_dw_chunked(g27, ct, grid.parents.shape[0]), w)
    return dw, dx, None, None


subm_conv_parent.defvjp(_subm_parent_fwd, _subm_parent_bwd)


# -- stride-2 down conv, children -> parents --------------------------------

@jax.custom_vjp
def down_conv_child_to_parent(w, storage, grid, pactive):
    # pactive unused in the forward (output rows are masked downstream); it
    # gates the backward so garbage parent rows contribute nothing
    return _down_conv_child_to_parent({"w": w}, grid, storage)


def _down_c2p_fwd(w, storage, grid, pactive):
    return down_conv_child_to_parent(w, storage, grid, pactive), \
        (w, storage, grid, pactive)


def _down_c2p_bwd(res, ct):
    w, storage, grid, pactive = res
    ct = ct * pactive[:, None].astype(ct.dtype)
    dx = _up_conv_parent_to_child({"w": _T(w)}, grid, ct, pactive)

    def g27(rows):
        return _child_gather(grid, storage,
                             grid.parents[rows][:, None, :] * 2 + _OFFSETS_ARR)

    dw = _shape_dw(_dw_chunked(g27, ct, grid.parents.shape[0]), w)
    return dw, dx, None, None


down_conv_child_to_parent.defvjp(_down_c2p_fwd, _down_c2p_bwd)


# -- transposed stride-2 conv, parents -> children --------------------------

@jax.custom_vjp
def up_conv_parent_to_child(w, storage_p, grid, pactive):
    return _up_conv_parent_to_child({"w": w}, grid, storage_p, pactive)


def _up_p2c_fwd(w, storage_p, grid, pactive):
    return up_conv_parent_to_child(w, storage_p, grid, pactive), \
        (w, storage_p, grid, pactive)


def _up_p2c_bwd(res, ct):
    w, storage_p, grid, pactive = res
    ct = ct * grid.cvalid[:, None].astype(ct.dtype)
    dx = _down_conv_child_to_parent({"w": _T(w)}, grid, ct) \
        * pactive[:, None].astype(ct.dtype)
    cc = grid.child_coords()

    def g27(rows):
        src2 = cc[rows][:, None, :] - _OFFSETS_ARR
        even = jnp.all((src2 & 1) == 0, axis=-1)
        x = _parent_gather(grid, storage_p, src2 >> 1, pactive)
        return x * even[..., None].astype(x.dtype)

    dw = _shape_dw(_dw_chunked(g27, ct, cc.shape[0]), w)
    return dw, dx, None, None


up_conv_parent_to_child.defvjp(_up_p2c_fwd, _up_p2c_bwd)


# -- stride-2 down conv, parents -> dense (R/4)^3 ---------------------------

def _canonical_parent_mask(grid, pactive):
    """True for the lowest-slot ACTIVE parent of each (R/4)-cell — exactly
    one writer per written cell (sibling parents compute identical values;
    this also makes the scatter deterministic)."""
    from ..ops.sparse import CHILD_OFFSETS
    half = grid.res // 2
    cell = grid.parents >> 1
    p = grid.parents
    slot = ((p[:, 0] & 1) << 2) | ((p[:, 1] & 1) << 1) | (p[:, 2] & 1)
    flat_table = grid.parent_table.reshape(-1)
    canon = pactive
    for k in range(8):
        sib = cell * 2 + CHILD_OFFSETS[k]
        sibc = jnp.clip(sib, 0, half - 1)
        idx = (sibc[:, 0] * half + sibc[:, 1]) * half + sibc[:, 2]
        prow = flat_table[idx]
        active = (prow >= 0) & pactive[jnp.clip(prow, 0)] \
            & jnp.all(sib < half, axis=-1)
        canon = canon & ~((k < slot) & active)
    return canon


from functools import partial as _fpartial


@_fpartial(jax.custom_vjp, nondiff_argnums=(4,))
def down_conv_parent_to_dense(w, storage_p, grid, pactive, out_res):
    return _down_conv_parent_to_dense({"w": w}, grid, storage_p, pactive,
                                      out_res)


def _down_p2d_fwd(w, storage_p, grid, pactive, out_res):
    return down_conv_parent_to_dense(w, storage_p, grid, pactive, out_res), \
        (w, storage_p, grid, pactive)


def _down_p2d_bwd(out_res, res, ct):
    w, storage_p, grid, pactive = res
    # ct arrives masked by m2 (every consumer of the dense levels multiplies
    # by the activity mask), so restricting to written cells is exact
    dx = _up_conv_dense_to_parent({"w": _T(w)}, grid, ct.astype(w.dtype)) \
        * pactive[:, None].astype(w.dtype)
    cells = grid.parents >> 1
    canon = _canonical_parent_mask(grid, pactive)
    cc = jnp.clip(cells, 0, out_res - 1)
    flat_ct = ct.reshape(-1, ct.shape[-1])
    idx = (cc[:, 0] * out_res + cc[:, 1]) * out_res + cc[:, 2]
    ct_rows = flat_ct[idx] * canon[:, None].astype(ct.dtype)

    def g27(rows):
        return _parent_gather(grid, storage_p,
                              cells[rows][:, None, :] * 2 + _OFFSETS_ARR,
                              pactive)

    dw = _shape_dw(
        _dw_chunked(g27, ct_rows.astype(w.dtype), cells.shape[0]), w)
    return dw, dx, None, None


down_conv_parent_to_dense.defvjp(_down_p2d_fwd, _down_p2d_bwd)


# -- transposed stride-2 conv, dense (R/4)^3 -> parents ---------------------

@jax.custom_vjp
def up_conv_dense_to_parent(w, dense, grid, pactive):
    # pactive gates the backward only (garbage rows masked downstream)
    return _up_conv_dense_to_parent({"w": w}, grid, dense)


def _up_d2p_fwd(w, dense, grid, pactive):
    return up_conv_dense_to_parent(w, dense, grid, pactive), \
        (w, dense, grid, pactive)


def _up_d2p_bwd(res, ct):
    w, dense, grid, pactive = res
    ct = ct * pactive[:, None].astype(ct.dtype)
    # d_dense restricted to ACTIVE cells: the primal dense levels are
    # activity-masked at every step, so upstream multiplies the cotangent by
    # the same mask — values at inactive cells never reach any gradient
    d_dense = _down_conv_parent_to_dense({"w": _T(w)}, grid, ct, pactive,
                                         dense.shape[0]).astype(dense.dtype)
    n = dense.shape[0]
    flat = dense.reshape(n ** 3, -1)

    def g27(rows):
        src2 = grid.parents[rows][:, None, :] - _OFFSETS_ARR
        even = jnp.all((src2 & 1) == 0, axis=-1)
        src = src2 >> 1
        inb = jnp.all((src >= 0) & (src < n), axis=-1) & even
        sc = jnp.clip(src, 0, n - 1)
        idx = (sc[..., 0] * n + sc[..., 1]) * n + sc[..., 2]
        x = flat[idx.reshape(-1)].reshape(*idx.shape, flat.shape[-1])
        return x * inb[..., None].astype(flat.dtype)

    dw = _shape_dw(_dw_chunked(g27, ct.astype(w.dtype),
                               grid.parents.shape[0]), w)
    return dw, d_dense, None, None


up_conv_dense_to_parent.defvjp(_up_d2p_fwd, _up_d2p_bwd)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, c_in, c_out):
    p = {"conv": conv3d_init(key, c_in, c_out, 3, bias=False)}
    bn_p, bn_s = batch_norm_init(c_out)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def init(key, d_in: int, d_out: int = 8, d_base: int = 8):
    names_specs = [
        ("conv0", d_in, d_base),
        ("conv1", d_base, d_base * 2), ("conv2", d_base * 2, d_base * 2),
        ("conv3", d_base * 2, d_base * 4), ("conv4", d_base * 4, d_base * 4),
        ("conv5", d_base * 4, d_base * 8), ("conv6", d_base * 8, d_base * 8),
        ("conv7", d_base * 8, d_base * 4),
        ("conv9", d_base * 4, d_base * 2),
        ("conv11", d_base * 2, d_base),
    ]
    keys = jax.random.split(key, len(names_specs) + 1)
    params, state = {}, {}
    for k, (name, ci, co) in zip(keys[:-1], names_specs):
        params[name], state[name] = _block_init(k, ci, co)
    params["out_lin"] = {
        "w": jax.random.normal(keys[-1], (d_base, d_out)) * (1.0 / jnp.sqrt(d_base))}
    return params, state


def init_list(key, conf):
    """SparseCostRegNetList equivalent (reg_network.py:91-107)."""
    d_in = conf.get_list("d_in")
    d_out = conf.get_list("d_out")
    d_base = conf.get_list("d_base")
    keys = jax.random.split(key, len(d_in))
    ps, ss = [], []
    for i in range(len(d_in)):
        p, s = init(keys[i], d_in[i], d_out[i], d_base[i])
        ps.append(p)
        ss.append(s)
    return ps, ss


# ---------------------------------------------------------------------------
# dense path
# ---------------------------------------------------------------------------

def _maxpool2(mask):
    """(X,Y,Z) bool -> (X/2,Y/2,Z/2) bool: any-child-active."""
    m = mask.astype(jnp.float32)[None, ..., None]
    out = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1),
                                (1, 2, 2, 2, 1), "VALID")
    return out[0, ..., 0] > 0


def _dense_block(p, s, x, mask, *, stride, training, transposed=False):
    """x (1,X,Y,Z,C); mask (X',Y',Z') of the OUTPUT level."""
    if transposed:
        y = conv3d_transpose_apply(p["conv"], x, stride=2)
    else:
        y = conv3d_apply(p["conv"], x, stride=stride)
    y, bn_s = masked_batch_norm_apply(p["bn"], s["bn"], y, mask[None], training=training)
    y = relu(y) * mask[None, ..., None]
    return y, {"bn": bn_s}


def apply_dense(params, state, grid: sp.VoxelGrid, feats, *, training=False):
    """Dense-masked execution.  feats: (P*8, C_in) on the grid's children."""
    res = grid.res
    x0 = sp.scatter_to_dense(grid, feats)[None]  # (1,R,R,R,C)
    m0 = sp.scatter_to_dense(grid, grid.cvalid[:, None].astype(jnp.float32))[..., 0] > 0
    m1 = _maxpool2(m0)
    m2 = _maxpool2(m1)
    m3 = _maxpool2(m2)

    ns = {}
    c0, ns["conv0"] = _dense_block(params["conv0"], state["conv0"], x0, m0, stride=1, training=training)
    x, ns["conv1"] = _dense_block(params["conv1"], state["conv1"], c0, m1, stride=2, training=training)
    c2, ns["conv2"] = _dense_block(params["conv2"], state["conv2"], x, m1, stride=1, training=training)
    x, ns["conv3"] = _dense_block(params["conv3"], state["conv3"], c2, m2, stride=2, training=training)
    c4, ns["conv4"] = _dense_block(params["conv4"], state["conv4"], x, m2, stride=1, training=training)
    x, ns["conv5"] = _dense_block(params["conv5"], state["conv5"], c4, m3, stride=2, training=training)
    x, ns["conv6"] = _dense_block(params["conv6"], state["conv6"], x, m3, stride=1, training=training)
    up, ns["conv7"] = _dense_block(params["conv7"], state["conv7"], x, m2, stride=2,
                                   training=training, transposed=True)
    x = c4 + up
    up, ns["conv9"] = _dense_block(params["conv9"], state["conv9"], x, m1, stride=2,
                                   training=training, transposed=True)
    x = c2 + up
    up, ns["conv11"] = _dense_block(params["conv11"], state["conv11"], x, m0, stride=2,
                                    training=training, transposed=True)
    x = c0 + up

    # gather back to the child rows
    cc = grid.child_coords()
    cc = jnp.clip(cc, 0, res - 1)
    mid = x[0][cc[:, 0], cc[:, 1], cc[:, 2]]
    mid = mid * grid.cvalid[:, None].astype(mid.dtype)
    out = mid @ params["out_lin"]["w"]
    return out, mid, ns


# ---------------------------------------------------------------------------
# hybrid (gather/scatter) path for fine stages
# ---------------------------------------------------------------------------

def _child_gather(grid, storage, coords):
    rows, valid = sp.lookup_rows(grid, coords)
    return sp.gather_feats(storage, rows, valid)


def _parent_gather(grid, storage_p, pcoords, pactive):
    """Lookup parent-level features at parent coords via the dense table."""
    half = grid.res // 2
    inb = jnp.all((pcoords >= 0) & (pcoords < half), axis=-1)
    c = jnp.clip(pcoords, 0, half - 1)
    idx = (c[..., 0] * half + c[..., 1]) * half + c[..., 2]
    prow = grid.parent_table.reshape(-1)[idx]
    valid = inb & (prow >= 0)
    row = jnp.clip(prow, 0)
    valid = valid & pactive[row]
    vals = storage_p[row.reshape(-1)].reshape(*row.shape, storage_p.shape[-1])
    return vals * valid[..., None].astype(vals.dtype)


def _w_at(w, off):
    """Kernel tap for spatial offset (conv: out[o] += w[off+1] x[o+off])."""
    return w[off[0] + 1, off[1] + 1, off[2] + 1]


def _subm_conv_child(p, grid, storage):
    """Submanifold conv at child level: (P*8, Cin) -> (P*8, Cout)."""
    cc = grid.child_coords()
    wf = _w_flat(p["w"])

    def chunk_fn(rows):
        x = _child_gather(grid, storage, cc[rows][:, None, :] + _OFFSETS_ARR)
        return x.reshape(x.shape[0], -1) @ wf

    out = _chunked_rows(chunk_fn, cc.shape[0])
    return out * grid.cvalid[:, None].astype(out.dtype)


def _subm_conv_parent(p, grid, storage_p, pactive):
    """Submanifold conv over the parent set: (P, Cin) -> (P, Cout).
    Chunked: the (P, 27, C) stacked-tap temp lane-pads to ~6 GB at
    stage-3 capacity inside the training backward."""
    wf = _w_flat(p["w"])

    def chunk_fn(rows):
        x = _parent_gather(grid, storage_p,
                           grid.parents[rows][:, None, :] + _OFFSETS_ARR,
                           pactive)
        return x.reshape(x.shape[0], -1) @ wf

    out = _chunked_rows(chunk_fn, grid.parents.shape[0])
    return out * pactive[:, None].astype(out.dtype)


def _down_conv_child_to_parent(p, grid, storage):
    """Stride-2 conv children -> parents: out[q] = sum_off w[off] x[2q+off].
    Chunked (see _subm_conv_parent)."""
    wf = _w_flat(p["w"])

    def chunk_fn(rows):
        x = _child_gather(grid, storage,
                          grid.parents[rows][:, None, :] * 2 + _OFFSETS_ARR)
        return x.reshape(x.shape[0], -1) @ wf

    return _chunked_rows(chunk_fn, grid.parents.shape[0])


def _down_conv_parent_to_dense(p, grid, storage_p, pactive, out_res):
    """Stride-2 conv parents -> dense (out_res^3), computed SPARSELY.

    The dense formulation (scatter parents to an (R/2)^3 volume + native
    XLA conv) is correct but untrainable at stage 3: every layout we tried
    for the 352^3 x 16ch intermediate gets a 128-lane-padded 22 GB copy
    somewhere in the training backward.  Observing that the conv output is
    immediately masked by m2 (= cells with >= 1 active parent, exactly
    {parent >> 1}), the conv only needs evaluating at those <= P cells:
    27 parent-table gathers + one tap-stacked matmul per ACTIVE cell, then
    a scatter into the small (R/4)^3 volume.  Sibling parents recompute the
    same cell (identical values) and padding rows scatter out of bounds."""
    cells = grid.parents >> 1                    # (P, 3) at R/4
    wf = _w_flat(p["w"])

    def chunk_fn(rows):
        src = cells[rows][:, None, :] * 2 + _OFFSETS_ARR   # (n, 27, 3) @R/2
        x = _parent_gather(grid, storage_p, src, pactive)
        return x.reshape(x.shape[0], -1) @ wf

    vals = _chunked_rows(chunk_fn, cells.shape[0])         # (P, Cout)
    cc = jnp.clip(cells, 0, out_res - 1)
    x = jnp.where(pactive, cc[:, 0], out_res)              # OOB -> dropped
    vol = jnp.zeros((out_res, out_res, out_res, vals.shape[-1]), vals.dtype)
    return vol.at[x, cc[:, 1], cc[:, 2]].set(vals, mode="drop")


def conv3d_stride2_slabbed(p, dense, nslab=4):
    """Stride-2 k=3 conv, slabbed along x with 1-row halos; identical to
    conv3d_apply(p, dense, stride=2)."""
    R = dense.shape[1]
    oR = R // 2
    so = -(-oR // nslab)
    outs = []
    for i in range(nslab):
        o0 = i * so
        o1 = min((i + 1) * so, oR)
        if o0 >= o1:
            break
        in0 = max(2 * o0 - 1, 0)
        in1 = min(2 * (o1 - 1) + 2, R)
        pad_lo = 1 if 2 * o0 - 1 < 0 else 0
        pad_hi = 1 if 2 * (o1 - 1) + 1 >= R else 0
        y = conv3d_apply(p, dense[:, in0:in1], stride=2,
                         padding=[(pad_lo, pad_hi), (1, 1), (1, 1)])
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def _up_conv_dense_to_parent(p, grid, dense):
    """Transposed stride-2 conv dense (R/4) -> parent set (R/2):
    out[c] = sum_{off: (c-off) even} w[off] x[(c-off)/2].
    Chunked (see _subm_conv_parent)."""
    n = dense.shape[0]
    flat = dense.reshape(n ** 3, -1)
    wf = _w_flat(p["w"])

    def chunk_fn(rows):
        src2 = grid.parents[rows][:, None, :] - _OFFSETS_ARR          # (n,27,3)
        even = jnp.all((src2 & 1) == 0, axis=-1)
        src = src2 >> 1
        inb = jnp.all((src >= 0) & (src < n), axis=-1) & even
        sc = jnp.clip(src, 0, n - 1)
        idx = (sc[..., 0] * n + sc[..., 1]) * n + sc[..., 2]
        x = flat[idx.reshape(-1)].reshape(*idx.shape, flat.shape[-1])
        x = x * inb[..., None].astype(flat.dtype)
        return x.reshape(x.shape[0], -1) @ wf

    return _chunked_rows(chunk_fn, grid.parents.shape[0])


def _up_conv_parent_to_child(p, grid, storage_p, pactive):
    """Transposed stride-2 conv parents -> children."""
    cc = grid.child_coords()
    wf = _w_flat(p["w"])

    def chunk_fn(rows):
        src2 = cc[rows][:, None, :] - _OFFSETS_ARR                    # (n,27,3)
        even = jnp.all((src2 & 1) == 0, axis=-1)
        x = _parent_gather(grid, storage_p, src2 >> 1, pactive)
        x = x * even[..., None].astype(storage_p.dtype)
        return x.reshape(x.shape[0], -1) @ wf

    out = _chunked_rows(chunk_fn, cc.shape[0])
    return out * grid.cvalid[:, None].astype(out.dtype)


def _bn_relu_rows(p, s, x, mask, training):
    y, bn_s = masked_batch_norm_apply(p["bn"], s["bn"], x, mask, training=training)
    return relu(y) * mask[:, None].astype(y.dtype), {"bn": bn_s}


def apply_hybrid(params, state, grid: sp.VoxelGrid, feats, *, training=False):
    """Gather/scatter execution: L0 (children) and L1 (parents) sparse,
    L2/L3 dense at R/4 and R/8."""
    res = grid.res
    cval = grid.cvalid
    pactive = grid.pvalid & jnp.any(cval.reshape(-1, 8), axis=1)
    r4 = res // 4

    ns = {}
    # one (P, 27) neighbor-row table shared by every sparse conv below —
    # each tap is then a single arithmetic-indexed storage gather (see the
    # neighbor-table section above); all convs run under gather-transpose
    # custom VJPs
    nbr = parent_neighbor_rows(grid)
    # L0
    x = subm_conv_child_nbr(params["conv0"]["conv"]["w"], feats, nbr, cval)
    c0, ns["conv0"] = _bn_relu_rows(params["conv0"], state["conv0"], x, cval, training)
    # L0 -> L1
    x = down_conv_c2p_nbr(params["conv1"]["conv"]["w"], c0, nbr, pactive, cval)
    x, ns["conv1"] = _bn_relu_rows(params["conv1"], state["conv1"], x, pactive, training)
    x = subm_conv_parent_nbr(params["conv2"]["conv"]["w"], x, nbr, pactive)
    c2, ns["conv2"] = _bn_relu_rows(params["conv2"], state["conv2"], x, pactive, training)
    # L1 -> L2 (dense from here down); activity at R/4 from parent occupancy
    occ_p = _scatter_parent_occupancy(grid, pactive)           # (R/2)^3 bool
    m2 = _maxpool2(occ_p)
    m3 = _maxpool2(m2)
    x = down_conv_parent_to_dense(params["conv3"]["conv"]["w"], c2, grid, pactive, r4)[None]
    x, bn_s = masked_batch_norm_apply(params["conv3"]["bn"], state["conv3"]["bn"], x,
                                      m2[None], training=training)
    ns["conv3"] = {"bn": bn_s}
    x = relu(x) * m2[None, ..., None]
    c4, ns["conv4"] = _dense_block(params["conv4"], state["conv4"], x, m2, stride=1, training=training)
    x, ns["conv5"] = _dense_block(params["conv5"], state["conv5"], c4, m3, stride=2, training=training)
    x, ns["conv6"] = _dense_block(params["conv6"], state["conv6"], x, m3, stride=1, training=training)
    up, ns["conv7"] = _dense_block(params["conv7"], state["conv7"], x, m2, stride=2,
                                   training=training, transposed=True)
    x = c4 + up
    # L2 -> L1
    up = up_conv_dense_to_parent(params["conv9"]["conv"]["w"], x[0], grid, pactive)
    up, ns["conv9"] = _bn_relu_rows(params["conv9"], state["conv9"], up, pactive, training)
    x = c2 + up
    # L1 -> L0
    up = up_conv_p2c_nbr(params["conv11"]["conv"]["w"], x, nbr, cval, pactive)
    up, ns["conv11"] = _bn_relu_rows(params["conv11"], state["conv11"], up, cval, training)
    mid = c0 + up
    out = mid @ params["out_lin"]["w"]
    return out, mid, ns


def _scatter_parent_occupancy(grid, pactive):
    half = grid.res // 2
    n3 = half ** 3
    p = jnp.clip(grid.parents, 0, half - 1)
    idx = (p[:, 0] * half + p[:, 1]) * half + p[:, 2]
    idx = jnp.where(pactive, idx, n3)
    flat = jnp.zeros((n3 + 1,), bool).at[idx].set(True, mode="drop")
    return flat[:n3].reshape(half, half, half)


def apply(params, state, grid, feats, *, training=False, dense_max_res=176):
    if grid.res <= dense_max_res:
        return apply_dense(params, state, grid, feats, training=training)
    return apply_hybrid(params, state, grid, feats, training=training)
