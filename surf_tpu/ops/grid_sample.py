"""Differentiable image / volume sampling.

This module replaces the reference's entire native sampling stack:

  * ``F.grid_sample`` call sites (bilinear 2D warps across models/modules/*,
    e.g. projector.py:544, volume.py:83)
  * the custom 722-line CUDA extension providing *twice*-differentiable 3D
    grid sampling (models/modules/grid_sample_cuda/, used via
    ``lookup_volume(..., sample_mode='grad')`` at projector.py:404) — in JAX,
    trilinear interpolation written as gathers + lerps is arbitrarily
    differentiable by construction, so second-order gradients (needed by the
    eikonal/smooth losses, implicit_surface.py:99-103) come for free.

Conventions
-----------
Images are channel-last ``(H, W, C)`` or batched ``(N, H, W, C)`` (XLA's
preferred layout on TPU).  Volumes are ``(X, Y, Z, C)`` indexed directly by
world-ordered coordinates — unlike the torch reference there is **no** axis
flip at call sites (the reference flips xyz→zyx to adapt to torch's
``(N,C,D,H,W)`` convention, projector.py:398).

``coords`` for 2D are ``(..., 2)`` = (x, y); for 3D ``(..., 3)`` = (x, y, z).
``normalized=True`` means coords live in ``[-1, 1]`` (torch grid_sample
convention); with ``align_corners=True``, -1/+1 map to the centers of the
corner texels; with ``align_corners=False``, to the outer edges.
Out-of-range corner taps contribute zero (torch ``padding_mode='zeros'``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial as _fpartial


# (8, 3) binary corner offsets shared by the stacked-gather interpolators
_CORNER_OFFSETS = jnp.array(
    [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)], dtype=jnp.int32)
_CORNER_OFFSETS_2D = jnp.array(
    [[0, 0], [1, 0], [0, 1], [1, 1]], dtype=jnp.int32)


def _unnormalize(c, size, align_corners):
    if align_corners:
        return (c + 1.0) * 0.5 * (size - 1)
    return ((c + 1.0) * size - 1.0) * 0.5


def _bilinear_corner_geometry(image, xy):
    """Per-corner indices/weights with the 4 corners UNROLLED.

    Never build (..., 4) / (..., 4, C) tap stacks here: a trailing tap or
    channel dim < the 128-lane tile pads 16-32x as an HLO temp — at
    full-image scale (the photometric warp loss differentiates src-image
    sampling at 480x640 points) those stacks alone pushed the train head
    graph past HBM (round-5 protocol OOM forensics; same rule as the
    trilinear core below and PERF_NOTES layout rules)."""
    H, W, C = image.shape
    c0 = jnp.floor(xy)
    frac = xy - c0
    c0i = c0.astype(jnp.int32)
    fx, fy = frac[..., 0], frac[..., 1]
    corners = []
    for ox, oy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        cx = c0i[..., 0] + ox
        cy = c0i[..., 1] + oy
        valid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        idx = jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)
        wx = fx if ox else 1.0 - fx
        wy = fy if oy else 1.0 - fy
        w = wx * wy * valid.astype(image.dtype)
        corners.append((idx, valid, w, ox, oy))
    return fx, fy, corners


@jax.custom_vjp
def _bilinear_core(image, xy):
    """Bilinear sampling at UNNORMALIZED pixel coords xy (..., 2).

    Custom VJP: XLA's autodiff scatters per-corner cotangents into an
    (H*W, C) table whose tiny channel dim pads to the 128-lane tile on TPU
    (32x wasted traffic at C=4); the hand-written transpose scatters
    CHANNEL-MAJOR (C, H*W) — the compact fixed-point layout (PERF_NOTES) —
    and reproduces XLA's gradients exactly (tests/test_grid_sample.py).
    """
    H, W, C = image.shape
    _, _, corners = _bilinear_corner_geometry(image, xy)
    flat = image.reshape(H * W, C)
    out = None
    for idx, _, w, _, _ in corners:
        vals = flat[idx.reshape(-1)].reshape(*idx.shape, C)
        term = vals * w[..., None]
        out = term if out is None else out + term
    return out


def _bilinear_core_fwd(image, xy):
    return _bilinear_core(image, xy), (image, xy)


def _bilinear_core_bwd(res, ct):
    image, xy = res
    H, W, C = image.shape
    fx, fy, corners = _bilinear_corner_geometry(image, xy)
    flat = image.reshape(H * W, C)

    # d_image: channel-major scatter-add per corner, invalid taps routed to
    # a dump column; d_xy via the product rule through frac (corner indices
    # carry no grad, matching autodiff of the gather formulation)
    dflat = jnp.zeros((C, H * W + 1), image.dtype)
    dx = dy = None
    for idx, valid, w, ox, oy in corners:
        col = jnp.where(valid, idx, H * W).reshape(-1)
        ctw = ct * w[..., None]                             # (..., C)
        dflat = dflat.at[:, col].add(ctw.reshape(-1, C).T, mode="drop")
        vals = flat[idx.reshape(-1)].reshape(*idx.shape, C)
        s = jnp.sum(vals * ct, axis=-1)                     # (...,)
        vf = valid.astype(image.dtype)
        wx = fx if ox else 1.0 - fx
        wy = fy if oy else 1.0 - fy
        tx = s * ((1.0 if ox else -1.0) * vf) * wy
        ty = s * ((1.0 if oy else -1.0) * vf) * wx
        dx = tx if dx is None else dx + tx
        dy = ty if dy is None else dy + ty
    d_image = dflat[:, :H * W].T.reshape(H, W, C)
    return d_image, jnp.stack([dx, dy], axis=-1)


_bilinear_core.defvjp(_bilinear_core_fwd, _bilinear_core_bwd)


def bilinear_sample_2d(image, coords, *, normalized=True, align_corners=True):
    """Bilinearly sample a single image at fractional pixel coordinates.

    Args:
      image: (H, W, C)
      coords: (..., 2) with (x, y); normalized to [-1,1] if ``normalized``.
    Returns:
      (..., C) sampled values; taps outside the image contribute 0.
    """
    H, W, C = image.shape
    x = coords[..., 0]
    y = coords[..., 1]
    if normalized:
        x = _unnormalize(x, W, align_corners)
        y = _unnormalize(y, H, align_corners)
    return _bilinear_core(image, jnp.stack([x, y], axis=-1))


def pack_bilinear_corners(image):
    """(H, W, C) -> (H+1, W+1, 4C) corner-packed image: row (j, i) holds the
    2x2 window of the sample whose floor cell is (x0, y0) = (i-1, j-1), as
    [v(x0,y0), v(x0+1,y0), v(x0,y0+1), v(x0+1,y0+1)] with zeros beyond the
    edges.  ONE row gather then fetches a bilinear sample's whole footprint
    (4x fewer gather descriptors — the scalar-gather latency dominates image
    sampling of depth maps at fine stages)."""
    H, W, C = image.shape
    p = jnp.pad(image, ((1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [p[0:H + 1, 0:W + 1], p[0:H + 1, 1:W + 2],
         p[1:H + 2, 0:W + 1], p[1:H + 2, 1:W + 2]], axis=-1)


def _packed_tap_geometry(packed, hw, coords, normalized, align_corners):
    H, W = hw
    x = coords[..., 0]
    y = coords[..., 1]
    if normalized:
        x = _unnormalize(x, W, align_corners)
        y = _unnormalize(y, H, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # rows exist for x0 in [-1, W-1], y0 in [-1, H-1]; anything further out
    # samples zero everywhere
    inb = (x0i >= -1) & (x0i <= W - 1) & (y0i >= -1) & (y0i <= H - 1)
    xi = jnp.clip(x0i, -1, W - 1) + 1
    yi = jnp.clip(y0i, -1, H - 1) + 1
    idx = yi * (W + 1) + xi
    return idx, inb, fx, fy


def _packed_gather(packed, idx, inb):
    C4 = packed.shape[-1]
    vals = packed.reshape(-1, C4)[idx.reshape(-1)].reshape(*idx.shape, C4)
    return vals * inb[..., None].astype(packed.dtype)


def bilinear_sample_packed(packed, coords, hw, *, normalized=True,
                           align_corners=True):
    """Bilinear sampling from a ``pack_bilinear_corners`` image; numerically
    equal to ``bilinear_sample_2d`` of the original
    (tests/test_grid_sample.py).  4x fewer gather descriptors than the
    per-corner form; the custom VJP scatters ONE 4C row per sample
    (channel-major) instead of 4 C-rows — unpacking d_packed back to
    d_image is autodiff of the (pure slice/pad) pack."""
    return _bsp_core(packed, coords, hw, normalized, align_corners)


@_fpartial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _bsp_core(packed, coords, hw, normalized, align_corners):
    idx, inb, fx, fy = _packed_tap_geometry(packed, hw, coords, normalized,
                                            align_corners)
    C = packed.shape[-1] // 4
    vals = _packed_gather(packed, idx, inb)
    fx, fy = fx[..., None], fy[..., None]
    v00, v10, v01, v11 = (vals[..., 0:C], vals[..., C:2 * C],
                          vals[..., 2 * C:3 * C], vals[..., 3 * C:])
    top = v00 * (1.0 - fx) + v10 * fx
    bot = v01 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _bsp_fwd(packed, coords, hw, normalized, align_corners):
    return _bsp_core(packed, coords, hw, normalized, align_corners), \
        (packed, coords)


def _bsp_bwd(hw, normalized, align_corners, res, ct):
    packed, coords = res
    idx, inb, fx, fy = _packed_tap_geometry(packed, hw, coords, normalized,
                                            align_corners)
    C4 = packed.shape[-1]
    C = C4 // 4
    gx, gy = 1.0 - fx, 1.0 - fy
    # d_packed: one channel-major 4C-row scatter per sample.  The per-corner
    # weights are concatenated along the (static-sliced) channel axis —
    # never via an (..., 4, C) stack, whose tiny trailing dims pad 16-32x as
    # HLO temps at filter-path scale (round-5 head-OOM layout rule)
    ctw = jnp.concatenate(
        [ct * (w)[..., None] for w in
         (gx * gy, fx * gy, gx * fy, fx * fy)], axis=-1)     # (..., 4C)
    col = jnp.where(inb, idx, packed.shape[0] * packed.shape[1]).reshape(-1)
    upd = ctw.reshape(-1, C4).T                              # (4C, N)
    n_rows = packed.shape[0] * packed.shape[1]
    dflat = jnp.zeros((C4, n_rows + 1), packed.dtype).at[:, col].add(
        upd, mode="drop")
    d_packed = dflat[:, :n_rows].T.reshape(packed.shape)

    # d_coords through the weights (corner indices carry no gradient);
    # corners unrolled into per-corner (N,) scalars, no (..., 4) stacks
    vals = _packed_gather(packed, idx, inb)
    s0, s1, s2, s3 = (jnp.sum(vals[..., k * C:(k + 1) * C] * ct, axis=-1)
                      for k in range(4))
    dfx = (s1 - s0) * gy + (s3 - s2) * fy
    dfy = (s2 - s0) * gx + (s3 - s1) * fx
    H, W = hw
    if normalized:
        dfx = dfx * (0.5 * (W - 1) if align_corners else 0.5 * W)
        dfy = dfy * (0.5 * (H - 1) if align_corners else 0.5 * H)
    return d_packed, jnp.stack([dfx, dfy], axis=-1)


_bsp_core.defvjp(_bsp_fwd, _bsp_bwd)


def nearest_sample_2d(image, coords, *, normalized=True, align_corners=True):
    """Nearest-neighbor 2D sampling, zero outside."""
    H, W, C = image.shape
    x = coords[..., 0]
    y = coords[..., 1]
    if normalized:
        x = _unnormalize(x, W, align_corners)
        y = _unnormalize(y, H, align_corners)
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xi_c = jnp.clip(xi, 0, W - 1)
    yi_c = jnp.clip(yi, 0, H - 1)
    val = image.reshape(H * W, C)[(yi_c * W + xi_c).reshape(-1)].reshape(*xi.shape, C)
    return val * valid[..., None].astype(image.dtype)


def trilinear_sample_3d(volume, coords, *, normalized=True, align_corners=True):
    """Trilinearly sample a volume; arbitrarily differentiable.

    Args:
      volume: (X, Y, Z, C)
      coords: (..., 3) with (x, y, z); normalized to [-1,1] if ``normalized``
        (otherwise absolute voxel coordinates).
    Returns:
      (..., C); taps outside the volume contribute 0.
    """
    X, Y, Z, C = volume.shape
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    if normalized:
        x = _unnormalize(x, X, align_corners)
        y = _unnormalize(y, Y, align_corners)
        z = _unnormalize(z, Z, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    flat = volume.reshape(X * Y * Z, C)
    # corners UNROLLED: stacked (..., 8, C) intermediates force the 8/C axes
    # onto the 128-lane dim (16x padding and multi-GB AD temporaries); per-
    # corner (..., C)/(...,) arrays lay out compactly.  (A sliced z-pair
    # gather halves the gather count on paper but TPU lowers sliced gathers
    # ~15x slower than element gathers — measured, do not reintroduce.)
    out = None
    for k in range(8):
        ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        cx, cy, cz = x0i + ox, y0i + oy, z0i + oz
        valid = (cx >= 0) & (cx < X) & (cy >= 0) & (cy < Y) & \
                (cz >= 0) & (cz < Z)
        idx = (jnp.clip(cx, 0, X - 1) * Y + jnp.clip(cy, 0, Y - 1)) * Z + \
            jnp.clip(cz, 0, Z - 1)
        vals = flat[idx.reshape(-1)].reshape(*idx.shape, C)
        w = (fx if ox else gx) * (fy if oy else gy) * (fz if oz else gz)
        w = w * valid.astype(volume.dtype)
        term = vals * w[..., None]
        out = term if out is None else out + term
    return out


def trilinear_sample_3d_cm(volume, coords, *, normalized=True,
                           align_corners=True):
    """``trilinear_sample_3d`` with a hand-written FIRST-ORDER VJP whose
    d_volume scatter is CHANNEL-MAJOR (C, X*Y*Z): XLA's autodiff scatters
    into (X, Y, Z, C) whose tiny minor dim pads to the 128-lane tile
    (128x traffic at C=1 — the matching-volume case).  Not jvp-able: keep
    the plain version for twice-differentiated paths."""
    X, Y, Z, C = volume.shape
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    if normalized:
        x = _unnormalize(x, X, align_corners)
        y = _unnormalize(y, Y, align_corners)
        z = _unnormalize(z, Z, align_corners)
    return _trilinear_core_cm(volume, jnp.stack([x, y, z], axis=-1))


@jax.custom_vjp
def _trilinear_core_cm(volume, xyz):
    return trilinear_sample_3d(volume, xyz, normalized=False)


def _tri_cm_fwd(volume, xyz):
    return _trilinear_core_cm(volume, xyz), (volume, xyz)


def _tri_cm_bwd(res, ct):
    volume, xyz = res
    X, Y, Z, C = volume.shape
    n3 = X * Y * Z
    flat = volume.reshape(n3, C)
    x0 = jnp.floor(xyz[..., 0])
    y0 = jnp.floor(xyz[..., 1])
    z0 = jnp.floor(xyz[..., 2])
    fx, fy, fz = xyz[..., 0] - x0, xyz[..., 1] - y0, xyz[..., 2] - z0
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    dflat = jnp.zeros((C, n3 + 1), volume.dtype)
    dx = jnp.zeros(xyz.shape[:-1], volume.dtype)
    dy = jnp.zeros_like(dx)
    dz = jnp.zeros_like(dx)
    for k in range(8):
        ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        cx, cy, cz = x0i + ox, y0i + oy, z0i + oz
        valid = (cx >= 0) & (cx < X) & (cy >= 0) & (cy < Y) & \
                (cz >= 0) & (cz < Z)
        idx = (jnp.clip(cx, 0, X - 1) * Y + jnp.clip(cy, 0, Y - 1)) * Z + \
            jnp.clip(cz, 0, Z - 1)
        wx = fx if ox else gx
        wy = fy if oy else gy
        wz = fz if oz else gz
        w = wx * wy * wz * valid.astype(volume.dtype)
        col = jnp.where(valid, idx, n3).reshape(-1)
        upd = (ct * w[..., None]).reshape(-1, C).T          # (C, N)
        dflat = dflat.at[:, col].add(upd, mode="drop")
        # d_coords via the product rule (corner indices carry no grad)
        vals = flat[idx.reshape(-1)].reshape(*idx.shape, C)
        s = jnp.sum(vals * ct, axis=-1) * valid.astype(volume.dtype)
        sx = 1.0 if ox else -1.0
        sy = 1.0 if oy else -1.0
        sz = 1.0 if oz else -1.0
        dx = dx + s * sx * wy * wz
        dy = dy + s * wx * sy * wz
        dz = dz + s * wx * wy * sz
    d_volume = dflat[:, :n3].T.reshape(X, Y, Z, C)
    return d_volume, jnp.stack([dx, dy, dz], axis=-1)


_trilinear_core_cm.defvjp(_tri_cm_fwd, _tri_cm_bwd)


def pack_trilinear_corners(volume):
    """(X, Y, Z, C) -> (X+1, Y+1, Z+1, 8C) corner-packed volume: row
    (i, j, k) holds the 2x2x2 window of the sample whose floor cell is
    (i-1, j-1, k-1), corner-major in the binary (ox, oy, oz) order of
    ``_CORNER_OFFSETS``, zeros beyond the edges.  ONE row gather then
    fetches a trilinear sample's whole footprint — 8x fewer gather
    descriptors for value-only passes (8x the memory: gate by size)."""
    X, Y, Z, C = volume.shape
    p = jnp.pad(volume, ((1, 1), (1, 1), (1, 1), (0, 0)))
    # sequential channel-slab writes into ONE output buffer: the concat
    # form materializes all 8 shifted copies at once (~2x the output size
    # in temporaries — OOM at 704^3 where the output alone is 5.6 GB bf16)
    out = jnp.zeros((X + 1, Y + 1, Z + 1, 8 * C), volume.dtype)
    for k, (ox, oy, oz) in enumerate(np.asarray(_CORNER_OFFSETS)):
        out = out.at[..., k * C:(k + 1) * C].set(
            p[ox:X + 1 + ox, oy:Y + 1 + oy, oz:Z + 1 + oz])
    return out


def _gather_cols(flat, idx):
    """flat (C, M); idx (n,) -> (n, C) — gathered axis minor, channel
    window major: XLA's native TPU gather form (no layout-change copy of
    the operand; see docs/PERF_NOTES.md and ops/sparse._gather_columns)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(1,), start_index_map=(1,))
    return jax.lax.gather(
        flat, idx[:, None].astype(jnp.int32), dn,
        slice_sizes=(flat.shape[0], 1),
        mode=jax.lax.GatherScatterMode.CLIP)


@jax.tree_util.register_pytree_node_class
class PackedVolume:
    """Corner-packed dense volume for value-only trilinear sampling, stored
    CHANNEL-MAJOR (K*C, rows): a row-major (..., 8C) pack of a 704^3 volume
    gets copied to a channel-planar layout by the TPU gather lowering (a
    5.7 GB HLO-temp copy — OOM); the (C', N) form is the layout fixed point
    (docs/PERF_NOTES.md).  ``kind="full"`` packs all 8 corners (8x memory,
    1 gather/sample), ``kind="yz"`` packs the 2x2 (y, z) window (4x memory,
    2 gathers).  Zeros-outside borders — numerically equal to
    ``trilinear_sample_3d`` (align_corners semantics via ``.sample``).
    dims/kind ride the pytree aux data so jit boundaries keep them static."""

    def __init__(self, packed, dims, kind):
        self.packed = packed      # (8C, rows) or (4C, rows)
        self.dims = tuple(int(d) for d in dims)
        self.kind = kind          # "full" | "yz"

    @classmethod
    def pack(cls, volume, kind="full"):
        fn = _pack_full_cm if kind == "full" else _pack_yz_cm
        return cls(jax.jit(fn)(volume), volume.shape[:3], kind)

    def sample(self, coords, *, normalized=True, align_corners=True):
        X, Y, Z = self.dims
        C = self.packed.shape[0] // (8 if self.kind == "full" else 4)
        shape = coords.shape[:-1]
        co = coords.reshape(-1, 3)
        x = co[:, 0]
        y = co[:, 1]
        z = co[:, 2]
        if normalized:
            x = _unnormalize(x, X, align_corners)
            y = _unnormalize(y, Y, align_corners)
            z = _unnormalize(z, Z, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        z0 = jnp.floor(z)
        fx = x - x0
        fy = y - y0
        fz = z - z0
        gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        z0i = z0.astype(jnp.int32)
        inb_yz = (y0i >= -1) & (y0i <= Y - 1) & (z0i >= -1) & (z0i <= Z - 1)
        yi = jnp.clip(y0i, -1, Y - 1) + 1
        zi = jnp.clip(z0i, -1, Z - 1) + 1
        out = None
        if self.kind == "full":
            inb = inb_yz & (x0i >= -1) & (x0i <= X - 1)
            xi = jnp.clip(x0i, -1, X - 1) + 1
            idx = (xi * (Y + 1) + yi) * (Z + 1) + zi
            g = _gather_cols(self.packed, idx)      # (n, 8C)
            g = g * inb[:, None].astype(g.dtype)
            for k in range(8):
                ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
                w = (fx if ox else gx) * (fy if oy else gy) * \
                    (fz if oz else gz)
                term = jax.lax.slice_in_dim(g, k * C, (k + 1) * C,
                                            axis=1) * w[:, None]
                out = term if out is None else out + term
        else:
            for ox in (0, 1):
                cx = x0i + ox
                vx = inb_yz & (cx >= 0) & (cx < X)
                idx = (jnp.clip(cx, 0, X - 1) * (Y + 1) + yi) * (Z + 1) + zi
                g = _gather_cols(self.packed, idx)  # (n, 4C)
                g = g * vx[:, None].astype(g.dtype)
                wx = fx if ox else gx
                for k in range(4):
                    oy, oz = (k >> 1) & 1, k & 1
                    w = wx * (fy if oy else gy) * (fz if oz else gz)
                    term = jax.lax.slice_in_dim(g, k * C, (k + 1) * C,
                                                axis=1) * w[:, None]
                    out = term if out is None else out + term
        return out.reshape(*shape, C)

    def tree_flatten(self):
        return (self.packed,), (self.dims, self.kind)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.packed = children[0]
        obj.dims, obj.kind = aux
        return obj


def _pack_full_cm(volume):
    """(X, Y, Z, C) -> (8C, (X+1)(Y+1)(Z+1)) channel-major zero-padded
    corner pack, written as sequential channel-slab updates into one
    buffer (the concat form peaks at ~2x the output size)."""
    X, Y, Z, C = volume.shape
    p = jnp.pad(volume, ((1, 1), (1, 1), (1, 1), (0, 0)))
    rows = (X + 1) * (Y + 1) * (Z + 1)
    out = jnp.zeros((8 * C, rows), volume.dtype)
    for k, (ox, oy, oz) in enumerate(np.asarray(_CORNER_OFFSETS)):
        slab = p[ox:X + 1 + ox, oy:Y + 1 + oy, oz:Z + 1 + oz]
        out = out.at[k * C:(k + 1) * C].set(
            jnp.moveaxis(slab, -1, 0).reshape(C, rows))
    return out


def _pack_yz_cm(volume):
    """(X, Y, Z, C) -> (4C, X(Y+1)(Z+1)) channel-major zero-padded yz-pack."""
    X, Y, Z, C = volume.shape
    p = jnp.pad(volume, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = X * (Y + 1) * (Z + 1)
    out = jnp.zeros((4 * C, rows), volume.dtype)
    for k in range(4):
        oy, oz = (k >> 1) & 1, k & 1
        slab = p[:, oy:Y + 1 + oy, oz:Z + 1 + oz]
        out = out.at[k * C:(k + 1) * C].set(
            jnp.moveaxis(slab, -1, 0).reshape(C, rows))
    return out


def pack_trilinear_corners_yz(volume):
    """(X, Y, Z, C) -> (X, Y+1, Z+1, 4C) yz-corner-packed volume: row
    (x, j, k) holds the 2x2 (y, z) window of the sample whose floor cell is
    (y0, z0) = (j-1, k-1) at x-plane x, in binary (oy, oz) order, zeros
    beyond the edges.  A trilinear sample then costs TWO row gathers (the
    x0 and x0+1 planes) instead of 8, at 4x the memory — the middle point
    of the pack-memory/gather-count trade (full 8-corner pack is 8x)."""
    X, Y, Z, C = volume.shape
    p = jnp.pad(volume, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((X, Y + 1, Z + 1, 4 * C), volume.dtype)
    for k in range(4):
        oy, oz = (k >> 1) & 1, k & 1
        out = out.at[..., k * C:(k + 1) * C].set(
            p[:, oy:Y + 1 + oy, oz:Z + 1 + oz])
    return out


def trilinear_sample_packed_yz(packed, coords, dims, *, normalized=True,
                               align_corners=True):
    """Trilinear sampling from a ``pack_trilinear_corners_yz`` volume;
    numerically equal to ``trilinear_sample_3d`` of the original.  VALUE
    path only (no custom transpose — use inside stop-gradient regions)."""
    X, Y, Z = dims
    C = packed.shape[-1] // 4
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    if normalized:
        x = _unnormalize(x, X, align_corners)
        y = _unnormalize(y, Y, align_corners)
        z = _unnormalize(z, Z, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    inb_yz = (y0i >= -1) & (y0i <= Y - 1) & (z0i >= -1) & (z0i <= Z - 1)
    yi = jnp.clip(y0i, -1, Y - 1) + 1
    zi = jnp.clip(z0i, -1, Z - 1) + 1
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    flat = packed.reshape(-1, 4 * C)
    out = None
    for ox in (0, 1):
        cx = x0i + ox
        vx = (cx >= 0) & (cx < X) & inb_yz
        idx = (jnp.clip(cx, 0, X - 1) * (Y + 1) + yi) * (Z + 1) + zi
        vals = flat[idx.reshape(-1)].reshape(*idx.shape, 4 * C)
        vals = vals * vx[..., None].astype(packed.dtype)
        wx = fx if ox else gx
        for k in range(4):
            oy, oz = (k >> 1) & 1, k & 1
            w = wx * (fy if oy else gy) * (fz if oz else gz)
            term = vals[..., k * C:(k + 1) * C] * w
            out = term if out is None else out + term
    return out


def trilinear_sample_packed_3d(packed, coords, dims, *, normalized=True,
                               align_corners=True):
    """Trilinear sampling from a ``pack_trilinear_corners`` volume;
    numerically equal to ``trilinear_sample_3d`` of the original.  VALUE
    path only (no custom transpose — use inside stop-gradient regions)."""
    X, Y, Z = dims
    C = packed.shape[-1] // 8
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    if normalized:
        x = _unnormalize(x, X, align_corners)
        y = _unnormalize(y, Y, align_corners)
        z = _unnormalize(z, Z, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    inb = (x0i >= -1) & (x0i <= X - 1) & (y0i >= -1) & (y0i <= Y - 1) & \
        (z0i >= -1) & (z0i <= Z - 1)
    xi = jnp.clip(x0i, -1, X - 1) + 1
    yi = jnp.clip(y0i, -1, Y - 1) + 1
    zi = jnp.clip(z0i, -1, Z - 1) + 1
    idx = (xi * (Y + 1) + yi) * (Z + 1) + zi
    vals = packed.reshape(-1, 8 * C)[idx.reshape(-1)].reshape(
        *idx.shape, 8 * C)
    vals = vals * inb[..., None].astype(packed.dtype)
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    out = None
    for k in range(8):
        ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        w = (fx if ox else gx) * (fy if oy else gy) * (fz if oz else gz)
        term = vals[..., k * C:(k + 1) * C] * w
        out = term if out is None else out + term
    return out


def nearest_sample_3d(volume, coords, *, normalized=True, align_corners=True):
    """Nearest-neighbor 3D sampling, zero outside. Used for mask volumes
    (reference: lookup_volume(..., sample_mode='nearest'),
    implicit_surface.py:86)."""
    X, Y, Z, C = volume.shape
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    if normalized:
        x = _unnormalize(x, X, align_corners)
        y = _unnormalize(y, Y, align_corners)
        z = _unnormalize(z, Z, align_corners)
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    zi = jnp.round(z).astype(jnp.int32)
    valid = (xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y) & (zi >= 0) & (zi < Z)
    xi_c = jnp.clip(xi, 0, X - 1)
    yi_c = jnp.clip(yi, 0, Y - 1)
    zi_c = jnp.clip(zi, 0, Z - 1)
    idx = (xi_c * Y + yi_c) * Z + zi_c
    val = volume.reshape(X * Y * Z, C)[idx.reshape(-1)].reshape(*xi.shape, C)
    return val * valid[..., None].astype(volume.dtype)


def lookup_volume(pts, volume, *, mode="bilinear", align_corners=None):
    """Sample a dense volume (or a list of volumes, concatenated on channels)
    at world points in [-1, 1]^3.

    Mirrors the reference's ``lookup_volume`` (projector.py:392-420) with
    channel-last volumes and no axis flipping.  ``mode`` is one of
    'bilinear' (trilinear), 'nearest', or 'grad' (alias of 'bilinear' —
    in JAX the trilinear path is already twice-differentiable).

    align_corners defaults: 'grad' -> True (matches the CUDA kernel call,
    projector.py:404), 'bilinear'/'nearest' -> False (matches
    ``F.grid_sample`` defaults at projector.py:406).
    """
    if align_corners is None:
        align_corners = mode == "grad"
    vols = volume if isinstance(volume, (list, tuple)) else [volume]
    feats = []
    for v in vols:
        if mode == "nearest":
            feats.append(nearest_sample_3d(v, pts, align_corners=align_corners))
        else:
            feats.append(trilinear_sample_3d(v, pts, align_corners=align_corners))
    return feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)


def resize_bilinear_2d(image, out_hw, *, align_corners=False):
    """Bilinear 2D resize matching torch ``F.interpolate(mode='bilinear')``.

    image: (H, W, C) -> (out_h, out_w, C)
    """
    out_h, out_w = out_hw
    H, W, _ = image.shape
    ys = jnp.arange(out_h, dtype=image.dtype)
    xs = jnp.arange(out_w, dtype=image.dtype)
    if align_corners:
        sy = (H - 1) / max(out_h - 1, 1)
        sx = (W - 1) / max(out_w - 1, 1)
        yy = ys * sy
        xx = xs * sx
    else:
        yy = (ys + 0.5) * (H / out_h) - 0.5
        xx = (xs + 0.5) * (W / out_w) - 0.5
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
    grid = jnp.stack(jnp.meshgrid(xx, yy, indexing="xy"), axis=-1)  # (out_h, out_w, 2)
    return bilinear_sample_2d(image, grid, normalized=False)


def upsample_trilinear_x2(volume):
    """2x trilinear upsampling matching torch
    ``F.interpolate(scale_factor=2, mode='trilinear', align_corners=False)``
    (reference: volume.py:109).  volume: (X, Y, Z, C) -> (2X, 2Y, 2Z, C).

    Separable closed form (no coordinate grids — a naive gather formulation
    would materialize a (2R)^3 x 3 grid, 4.2 GB at R=352): with
    align_corners=False the even output sits at source i-0.25 and the odd at
    i+0.25, so out = interleave(0.75 v + 0.25 shift_down(v),
                                0.75 v + 0.25 shift_up(v)) per axis.
    """
    # Separable per-axis interleave with the target axis moved to the FRONT
    # (major): the (X, 2, rest) stack intermediate keeps its large dims
    # minor, so layouts stay compact — and the AD transpose is again just
    # slicing+adds.  (The earlier conv_general_dilated formulation kept the
    # forward compact but its BACKWARD materialized a 23 GB
    # convolution_select_fusion temp at 352->704 during staged training;
    # an axis-LAST interleave pads the trailing 2 to the 128-lane tile.)
    def up_axis(v, axis):
        perm = [axis] + [a for a in range(v.ndim) if a != axis]
        vt = jnp.transpose(v, perm)                       # (X, rest...)
        X = vt.shape[0]
        lo = jnp.concatenate([vt[:1], vt[:-1]], axis=0)   # in[i-1], edge
        hi = jnp.concatenate([vt[1:], vt[-1:]], axis=0)   # in[i+1], edge
        even = 0.75 * vt + 0.25 * lo
        odd = 0.75 * vt + 0.25 * hi
        y = jnp.stack([even, odd], axis=1).reshape(2 * X, *vt.shape[1:])
        return jnp.transpose(y, list(np.argsort(perm)))

    out = volume
    for ax in range(3):
        out = up_axis(out, ax)
    return out
