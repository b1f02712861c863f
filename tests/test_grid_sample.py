"""Golden tests for sampling ops against torch.nn.functional.grid_sample
(torch CPU is available in the image; used for testing only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from surf_tpu.ops import (
    bilinear_sample_2d,
    nearest_sample_3d,
    trilinear_sample_3d,
    resize_bilinear_2d,
    upsample_trilinear_x2,
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_2d_matches_torch(align_corners):
    H, W, C = 13, 17, 5
    img = RNG.randn(H, W, C).astype(np.float32)
    coords = RNG.uniform(-1.3, 1.3, size=(40, 2)).astype(np.float32)

    ours = bilinear_sample_2d(jnp.asarray(img), jnp.asarray(coords), align_corners=align_corners)

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]            # (1,C,H,W)
    t_grid = torch.from_numpy(coords)[None, None]                   # (1,1,40,2)
    ref = TF.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                         align_corners=align_corners)
    ref = ref[0, :, 0].permute(1, 0).numpy()                        # (40,C)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_trilinear_3d_matches_torch(align_corners):
    X, Y, Z, C = 9, 11, 7, 4
    vol = RNG.randn(X, Y, Z, C).astype(np.float32)
    pts = RNG.uniform(-1.2, 1.2, size=(50, 3)).astype(np.float32)

    ours = trilinear_sample_3d(jnp.asarray(vol), jnp.asarray(pts), align_corners=align_corners)

    # torch layout: (1, C, D, H, W) with grid (x,y,z) indexing (W,H,D).
    # Our (X,Y,Z,C) with pts (x,y,z) indexing (X,Y,Z) == torch volume
    # permuted so D=X,H=Y,W=Z and grid flipped to (z,y,x) — exactly the
    # reference's flip at projector.py:398.
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]          # (1,C,X,Y,Z)
    t_grid = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]  # (1,1,1,50,3) z,y,x
    ref = TF.grid_sample(t_vol, t_grid, mode="bilinear", padding_mode="zeros",
                         align_corners=align_corners)
    ref = ref[0, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_nearest_3d_matches_torch():
    X, Y, Z, C = 8, 8, 8, 2
    vol = RNG.randn(X, Y, Z, C).astype(np.float32)
    # keep away from .5 boundaries where rounding conventions differ
    pts = (RNG.uniform(-0.9, 0.9, size=(30, 3)) + 0.013).astype(np.float32)

    ours = nearest_sample_3d(jnp.asarray(vol), jnp.asarray(pts), align_corners=False)
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    t_grid = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]
    ref = TF.grid_sample(t_vol, t_grid, mode="nearest", padding_mode="zeros",
                         align_corners=False)
    ref = ref[0, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_trilinear_twice_differentiable():
    """The capability the reference needed 722 lines of CUDA for
    (grid_sample_cuda): second-order gradients through volume lookups."""
    X = 6
    vol = jnp.asarray(RNG.randn(X, X, X, 1).astype(np.float32))

    def f(p):
        return trilinear_sample_3d(vol, p[None], align_corners=True)[0, 0]

    p0 = jnp.array([0.1, -0.2, 0.3])
    g = jax.grad(f)(p0)
    assert np.all(np.isfinite(np.asarray(g)))

    # eikonal-style: differentiate |grad| w.r.t. the volume
    def eik(v):
        def f2(p):
            return trilinear_sample_3d(v, p[None], align_corners=True)[0, 0]
        gg = jax.grad(f2)(p0)
        return jnp.sum(gg ** 2)

    dvol = jax.grad(eik)(vol)
    assert np.all(np.isfinite(np.asarray(dvol)))
    assert np.abs(np.asarray(dvol)).sum() > 0


def test_resize_bilinear_matches_torch():
    H, W, C = 10, 14, 3
    img = RNG.randn(H, W, C).astype(np.float32)
    out = resize_bilinear_2d(jnp.asarray(img), (19, 27), align_corners=False)
    t = TF.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None], size=(19, 27),
                       mode="bilinear", align_corners=False)
    ref = t[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_upsample_trilinear_x2_matches_torch():
    X, Y, Z, C = 5, 6, 4, 2
    vol = RNG.randn(X, Y, Z, C).astype(np.float32)
    out = upsample_trilinear_x2(jnp.asarray(vol))
    t = TF.interpolate(torch.from_numpy(vol).permute(3, 0, 1, 2)[None], scale_factor=2,
                       mode="trilinear", align_corners=False)
    ref = t[0].permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_bilinear_custom_vjp_matches_autodiff():
    """The channel-major custom VJP of bilinear_sample_2d must reproduce
    XLA autodiff of the raw gather formulation exactly — d_image (the
    scatter transpose) and d_coords (the frac product rule) both."""
    from surf_tpu.ops.grid_sample import (_CORNER_OFFSETS_2D, _unnormalize,
                                          bilinear_sample_2d)

    H, W, C = 9, 12, 4
    img = jnp.asarray(RNG.randn(H, W, C).astype(np.float32))
    coords = jnp.asarray((RNG.rand(37, 2) * 2.4 - 1.2).astype(np.float32))
    ct = jnp.asarray(RNG.randn(37, C).astype(np.float32))

    def raw(image, cds):  # the pre-custom-vjp formulation, autodiffed by XLA
        x = _unnormalize(cds[..., 0], W, True)
        y = _unnormalize(cds[..., 1], H, True)
        xy = jnp.stack([x, y], axis=-1)
        c0 = jnp.floor(xy)
        frac = xy - c0
        corners = c0.astype(jnp.int32)[..., None, :] + _CORNER_OFFSETS_2D
        dims = jnp.array([W, H], jnp.int32)
        valid = jnp.all((corners >= 0) & (corners < dims), axis=-1)
        cc = jnp.clip(corners, 0, dims - 1)
        idx = cc[..., 1] * W + cc[..., 0]
        vals = image.reshape(H * W, C)[idx.reshape(-1)].reshape(*idx.shape, C)
        offs = _CORNER_OFFSETS_2D.astype(image.dtype)
        w = jnp.prod(jnp.where(offs > 0, frac[..., None, :],
                               1.0 - frac[..., None, :]),
                     axis=-1) * valid.astype(image.dtype)
        return jnp.sum(vals * w[..., None], axis=-2)

    gi_r, gc_r = jax.grad(
        lambda im, cd: jnp.sum(raw(im, cd) * ct), argnums=(0, 1))(img, coords)
    gi_c, gc_c = jax.grad(
        lambda im, cd: jnp.sum(bilinear_sample_2d(im, cd) * ct),
        argnums=(0, 1))(img, coords)
    np.testing.assert_allclose(np.asarray(gi_c), np.asarray(gi_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_c), np.asarray(gc_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_packed_matches_unpacked(align_corners):
    """pack_bilinear_corners + bilinear_sample_packed == bilinear_sample_2d,
    including samples straddling and beyond the image border."""
    from surf_tpu.ops import pack_bilinear_corners, bilinear_sample_packed
    H, W, C = 13, 17, 3
    img = jnp.asarray(RNG.randn(H, W, C).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(-1.6, 1.6, (500, 2)).astype(np.float32))
    ref = bilinear_sample_2d(img, coords, align_corners=align_corners)
    packed = pack_bilinear_corners(img)
    got = bilinear_sample_packed(packed, coords, (H, W),
                                 align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_trilinear_packed_matches_unpacked(align_corners):
    from surf_tpu.ops import pack_trilinear_corners, trilinear_sample_packed_3d
    X, Y, Z, C = 9, 11, 7, 2
    vol = jnp.asarray(RNG.randn(X, Y, Z, C).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(-1.7, 1.7, (800, 3)).astype(np.float32))
    ref = trilinear_sample_3d(vol, coords, align_corners=align_corners)
    packed = pack_trilinear_corners(vol)
    got = trilinear_sample_packed_3d(packed, coords, (X, Y, Z),
                                     align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bilinear_packed_vjp_matches_unpacked():
    """grads of sum(bilinear_sample_packed(pack(img))) w.r.t. img and coords
    equal the unpacked path's."""
    from surf_tpu.ops import pack_bilinear_corners, bilinear_sample_packed
    H, W, C = 11, 9, 4
    img = jnp.asarray(RNG.randn(H, W, C).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(-1.4, 1.4, (300, 2)).astype(np.float32))
    ct = jnp.asarray(RNG.randn(300, C).astype(np.float32))

    def f_ref(im, co):
        return jnp.sum(bilinear_sample_2d(im, co, align_corners=True) * ct)

    def f_pack(im, co):
        return jnp.sum(bilinear_sample_packed(
            pack_bilinear_corners(im), co, (H, W), align_corners=True) * ct)

    gi_r, gc_r = jax.grad(f_ref, argnums=(0, 1))(img, coords)
    gi_p, gc_p = jax.grad(f_pack, argnums=(0, 1))(img, coords)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-4)


def test_trilinear_cm_vjp_matches_autodiff():
    from surf_tpu.ops import trilinear_sample_3d_cm
    X, Y, Z, C = 7, 9, 8, 2
    vol = jnp.asarray(RNG.randn(X, Y, Z, C).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(-1.5, 1.5, (400, 3)).astype(np.float32))
    ct = jnp.asarray(RNG.randn(400, C).astype(np.float32))

    def f_ref(v, co):
        return jnp.sum(trilinear_sample_3d(v, co, align_corners=False) * ct)

    def f_cm(v, co):
        return jnp.sum(trilinear_sample_3d_cm(v, co, align_corners=False) * ct)

    assert np.allclose(f_cm(vol, coords), f_ref(vol, coords), atol=1e-5)
    gv_r, gc_r = jax.grad(f_ref, argnums=(0, 1))(vol, coords)
    gv_c, gc_c = jax.grad(f_cm, argnums=(0, 1))(vol, coords)
    np.testing.assert_allclose(np.asarray(gv_c), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_c), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-4)


def test_build_z_vals_packed_matches_unpacked():
    """build_z_vals with a (packed, dims) corner-packed density volume is
    bit-identical to the plain-volume path (same RNG splits, same math)."""
    from surf_tpu.nn import implicit_surface
    from surf_tpu.ops import PackedVolume
    R = 12
    vol = jnp.asarray(RNG.randn(R, R, R, 1).astype(np.float32))
    static = {"n_samples": [8, 6, 4], "sample_ranges": [1.0, 0.4, 0.1],
              "n_depth": 32, "perturb": 1.0}
    nr = 64
    rays_o = jnp.asarray(RNG.uniform(-0.2, 0.2, (nr, 3)).astype(np.float32))
    d = RNG.randn(nr, 3).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    near = jnp.full((nr, 1), 0.5, jnp.float32)
    far = jnp.full((nr, 1), 2.5, jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = implicit_surface.build_z_vals(key, static, rays_o, rays_d,
                                        near, far, vol)
    # PackedVolume crosses the jit boundary with dims/kind as static aux
    zfn = jax.jit(lambda mv: implicit_surface.build_z_vals(
        key, static, rays_o, rays_d, near, far, mv))
    got = zfn(PackedVolume.pack(vol, "full"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align_corners", [True, False])
def test_trilinear_packed_yz_matches_unpacked(align_corners):
    from surf_tpu.ops import (pack_trilinear_corners_yz,
                              trilinear_sample_packed_yz)
    X, Y, Z, C = 9, 11, 7, 2
    vol = jnp.asarray(RNG.randn(X, Y, Z, C).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(-1.7, 1.7, (800, 3)).astype(np.float32))
    ref = trilinear_sample_3d(vol, coords, align_corners=align_corners)
    packed = pack_trilinear_corners_yz(vol)
    assert packed.shape == (X, Y + 1, Z + 1, 4 * C)
    got = trilinear_sample_packed_yz(packed, coords, (X, Y, Z),
                                     align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_build_z_vals_packed_yz_matches_unpacked():
    from surf_tpu.nn import implicit_surface
    from surf_tpu.ops import PackedVolume
    R = 12
    vol = jnp.asarray(RNG.randn(R, R, R, 1).astype(np.float32))
    static = {"n_samples": [8, 6, 4], "sample_ranges": [1.0, 0.4, 0.1],
              "n_depth": 32, "perturb": 1.0}
    nr = 64
    rays_o = jnp.asarray(RNG.uniform(-0.2, 0.2, (nr, 3)).astype(np.float32))
    d = RNG.randn(nr, 3).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    near = jnp.full((nr, 1), 0.5, jnp.float32)
    far = jnp.full((nr, 1), 2.5, jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = implicit_surface.build_z_vals(key, static, rays_o, rays_d,
                                        near, far, vol)
    zfn = jax.jit(lambda mv: implicit_surface.build_z_vals(
        key, static, rays_o, rays_d, near, far, mv))
    got = zfn(PackedVolume.pack(vol, "yz"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
