"""Camera projection / ray geometry ops (pure jnp, shape-polymorphic).

Functional equivalents of the geometry math scattered through the reference's
models/modules/projector.py, volume.py and matching_field.py, expressed once
and reused.  All cameras follow the reference's convention:

  * ``intr``: (4, 4) pinhole intrinsics (top-left 3x3 = K)
  * ``c2w``:  (4, 4) camera-to-world pose
  * world points live in the unit-sphere-normalized scene frame
"""

from __future__ import annotations

import jax.numpy as jnp


def to_homo(pts):
    """(..., 3) -> (..., 4) homogeneous."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def invert_pose(c2w):
    """Closed-form inverse of rigid pose(s) [R|t]: [R^T | -R^T t].

    Avoids jnp.linalg.inv's LU decomposition inside jit (slower and less
    precise on TPU than the analytic form).  Supports leading batch dims.
    """
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, new_t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], c2w.dtype), (*c2w.shape[:-2], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def invert_intrinsics(intr):
    """Closed-form inverse of pinhole K (upper-triangular 3x3 with K[2,2]=1),
    batched.  intr: (..., 4, 4) or (..., 3, 3) -> (..., 3, 3)."""
    K = intr[..., :3, :3]
    fx = K[..., 0, 0]
    s = K[..., 0, 1]
    cx = K[..., 0, 2]
    fy = K[..., 1, 1]
    cy = K[..., 1, 2]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    inv = jnp.stack([
        jnp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], -1),
        jnp.stack([z, 1.0 / fy, -cy / fy], -1),
        jnp.stack([z, z, o], -1),
    ], axis=-2)
    return inv


def world_to_cam(pts, c2w):
    """pts (..., 3), c2w (4,4) -> camera-frame points (..., 3)."""
    w2c = invert_pose(c2w)
    return jnp.einsum("ij,...j->...i", w2c[:3, :4], to_homo(pts))


def cam_to_pixel(cam_pts, intr):
    """cam_pts (..., 3) -> (xy (..., 2), depth (...,))."""
    proj = jnp.einsum("ij,...j->...i", intr[:3, :3], cam_pts)
    depth = proj[..., 2]
    xy = proj[..., :2] / (depth[..., None] + 1e-10)
    return xy, depth


def project_points(pts, intr, c2w):
    """World points -> pixel xy + camera depth.

    Equivalent to the projection blocks at volume.py:68-79 and
    projector.py:529-536.
    Returns (xy (..., 2), depth (...,)).
    """
    return cam_to_pixel(world_to_cam(pts, c2w), intr)


def project_points_all(pts, intrs, c2ws):
    """Project the same points into every view at once.

    pts (N, 3); intrs/c2ws (V, 4, 4) -> (xy (V, N, 2), depth (V, N)).
    One einsum pair instead of a per-view Python loop (smaller jaxprs,
    better MXU batching).
    """
    w2cs = invert_pose(c2ws)
    cam = jnp.einsum("vij,nj->vni", w2cs[:, :3, :4], to_homo(pts))
    proj = jnp.einsum("vij,vnj->vni", intrs[:, :3, :3], cam)
    depth = proj[..., 2]
    xy = proj[..., :2] / (depth[..., None] + 1e-10)
    return xy, depth


def pixel_to_normalized(xy, hw, *, align_corners=True):
    """Pixel xy -> [-1, 1] normalized coords for grid sampling.

    Matches the reference's ``norm_x = x / ((w-1)/2) - 1`` convention
    (volume.py:73-74), i.e. align_corners=True normalization.
    """
    h, w = hw
    if align_corners:
        nx = xy[..., 0] / ((w - 1) / 2.0) - 1.0
        ny = xy[..., 1] / ((h - 1) / 2.0) - 1.0
    else:
        nx = (2.0 * xy[..., 0] + 1.0) / w - 1.0
        ny = (2.0 * xy[..., 1] + 1.0) / h - 1.0
    return jnp.stack([nx, ny], axis=-1)


def in_frustum_mask(xy, depth, hw, *, inclusive=True):
    """Whether pixel-xy falls inside the image and in front of the camera.

    Matches volume.py:78 (abs(norm)<=1 & depth>0) when ``inclusive``; matches
    projector.py:536 half-open bounds (0 <= x < w) otherwise.
    """
    h, w = hw
    x = xy[..., 0]
    y = xy[..., 1]
    if inclusive:
        return (jnp.abs(x / ((w - 1) / 2.0) - 1.0) <= 1.0) & \
               (jnp.abs(y / ((h - 1) / 2.0) - 1.0) <= 1.0) & (depth > 0)
    return (x >= 0) & (x < w) & (y >= 0) & (y < h) & (depth > 0)


def pixels_to_rays(pixels_xy, intr, c2w):
    """Pixel coordinates -> normalized world ray directions + origin.

    Matches dtu.py:428-432 / matching_field.py:97-101: p = K^-1 [x,y,1],
    d = p/|p| rotated to world, o = camera center.
    Returns (rays_o (..., 3), rays_d (..., 3)).
    """
    p = to_homo(pixels_xy)  # (..., 3) with z=1
    cam_dirs = jnp.einsum("ij,...j->...i", invert_intrinsics(intr), p)
    cam_dirs = cam_dirs / jnp.linalg.norm(cam_dirs, axis=-1, keepdims=True)
    rays_d = jnp.einsum("ij,...j->...i", c2w[:3, :3], cam_dirs)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ray_z_cos(rays_d, c2w):
    """cos factor converting a z-val along a *normalized* ray into camera
    depth: depth = z_val * (R^-1 d)_z  (matching_field.py:52-55)."""
    cam_d = jnp.einsum("ji,...j->...i", c2w[:3, :3], rays_d)  # R^T d
    return cam_d[..., 2]


def compute_ray_diff(pts, ref_c2w, src_c2ws):
    """IBRNet-style ray direction difference features.

    Re-derivation of the reference's ``compute_angle`` (projector.py:485-498).
    pts: (n, 3); ref_c2w (4,4); src_c2ws (s, 4, 4).
    Returns (n, s, 4): unit direction difference (3) + dot product (1).
    """
    def _snorm(x):
        # finite-gradient norm (masked/degenerate points can make the
        # difference exactly zero; jnp.linalg.norm has NaN grads at 0)
        return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)

    ray2ref = ref_c2w[:3, 3][None, None] - pts[:, None, :]       # (n, 1, 3)
    ray2ref = ray2ref / (_snorm(ray2ref) + 1e-6)
    ray2src = src_c2ws[None, :, :3, 3] - pts[:, None, :]          # (n, s, 3)
    ray2src = ray2src / (_snorm(ray2src) + 1e-6)
    diff = ray2ref - ray2src
    diff_norm = _snorm(diff)
    dot = jnp.sum(ray2ref * ray2src, axis=-1, keepdims=True)
    direction = diff / jnp.clip(diff_norm, 1e-6)
    return jnp.concatenate([direction, dot], axis=-1)


def make_pixel_grid(hw, out_hw=None, dtype=jnp.float32):
    """Full-resolution pixel center grid, optionally strided to ``out_hw``
    via linspace over the original extent (matching matching_field.py:84-88
    and dtu.py:419-421).

    Returns (out_h*out_w, 2) pixel (x, y) coordinates.
    """
    h, w = hw
    if out_hw is None:
        out_hw = hw
    oh, ow = out_hw
    # In-graph iota, NOT a host constant: an embedded (n, 2) f32 constant is
    # tile-padded to lane width 128 in the TPU executable (~64x bloat;
    # hundreds of MB across the per-stage train graphs — OOMed the protocol
    # train step).  Exactness still matters: the matching field FLOORS these
    # coordinates to index previous-stage depth maps (matching_field.py:104),
    # and torch.linspace yields exactly 1.0 where jnp's f32 linspace yields
    # 0.99999994.  j*(w-1) is exact in f32 (< 2^24 for any sane image), and
    # IEEE division is correctly rounded, so the quotient is exactly integer
    # wherever the true value is — matching torch.linspace at every floor
    # boundary (pinned by tests/test_composite_parity.py).
    def _axis(n, extent):
        j = jnp.arange(n, dtype=dtype)
        if n <= 1:
            return jnp.zeros((max(n, 1),), dtype)
        return (j * dtype(extent - 1.0)) / dtype(n - 1.0)

    tx = _axis(ow, w)
    ty = _axis(oh, h)
    xx, yy = jnp.meshgrid(tx, ty, indexing="xy")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
