"""Color-path lookups: fused pyramid vs the corner-packed pyramid and the
bf16 blending-MLP option (render value-path accelerations, PERF_NOTES
round-5).  Reference semantics: models/modules/projector.py:501-556 +
blending_network.py:22-118."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surf_tpu.ops.feature_lookup import (
    lookup_feature_fused, lookup_feature_packed, fuse_pyramid, pack_fused)
from surf_tpu.nn import blending_net
from surf_tpu.config import ConfigFactory

RNG = np.random.default_rng(7)


def _scene(nv=4, hw=(24, 32)):
    h, w = hw
    imgs = jnp.asarray(RNG.uniform(0, 1, (nv, h, w, 3)).astype(np.float32))
    feats = [
        jnp.asarray(RNG.normal(size=(nv, h, w, 4)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(nv, h // 2, w // 2, 4)).astype(np.float32)),
    ]
    intrs = np.tile(np.eye(4, dtype=np.float32), (nv, 1, 1))
    intrs[:, 0, 0] = w * 0.8
    intrs[:, 1, 1] = w * 0.8
    intrs[:, 0, 2] = w / 2
    intrs[:, 1, 2] = h / 2
    c2ws = np.tile(np.eye(4, dtype=np.float32), (nv, 1, 1))
    for i in range(nv):
        th = 0.3 * i
        c2ws[i, :3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32)
        c2ws[i, :3, 3] = -c2ws[i, :3, 2] * 3.0
    pts = jnp.asarray(RNG.uniform(-0.8, 0.8, (200, 3)).astype(np.float32))
    return imgs, feats, jnp.asarray(intrs), jnp.asarray(c2ws), pts


def test_packed_pyramid_matches_fused():
    imgs, feats, intrs, c2ws, pts = _scene()
    hw_levels = [f.shape[1:3] for f in feats]
    fused = fuse_pyramid(imgs, feats)
    rf_ref, rd_ref, m_ref = lookup_feature_fused(pts, fused, intrs, c2ws,
                                                 hw_levels)
    pp = pack_fused(fused)          # keep f32: exact parity expected
    rf, rd, m = lookup_feature_packed(pts, pp, intrs, c2ws, hw_levels)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rf_ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_pyramid_bf16_close():
    imgs, feats, intrs, c2ws, pts = _scene()
    hw_levels = [f.shape[1:3] for f in feats]
    fused = fuse_pyramid(imgs, feats)
    rf_ref, _, m_ref = lookup_feature_fused(pts, fused, intrs, c2ws,
                                            hw_levels)
    pp = pack_fused(fused, dtype=jnp.bfloat16)
    assert pp.packed.dtype == jnp.bfloat16
    rf, _, m = lookup_feature_packed(pts, pp, intrs, c2ws, hw_levels,
                                     out_dtype=jnp.float32)
    assert rf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    # bf16 has ~3 decimal digits; tolerance relative to the value scale
    scale = float(np.abs(np.asarray(rf_ref)).max()) + 1e-6
    assert float(np.abs(np.asarray(rf) - np.asarray(rf_ref)).max()) \
        < 2e-2 * scale


def test_packed_pyramid_jittable():
    """PackedPyramid crosses jit boundaries with hw static (pytree aux)."""
    imgs, feats, intrs, c2ws, pts = _scene()
    hw_levels = [f.shape[1:3] for f in feats]
    fused = fuse_pyramid(imgs, feats)
    pp = jax.jit(pack_fused)(fused)

    @jax.jit
    def f(pts, pp):
        return lookup_feature_packed(pts, pp, intrs, c2ws, hw_levels)[0]

    out = f(pts, pp)
    ref = lookup_feature_packed(pts, pp, intrs, c2ws, hw_levels)[0]
    # jit fuses the lerp chain differently: fp reassociation ~1e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_blending_bf16_close():
    conf = ConfigFactory.parse_string("c { d_feature = 11 }")["c"]
    params, static = blending_net.init(jax.random.PRNGKey(0), conf)
    n, s = 300, 3
    rgb_feat = jnp.asarray(RNG.normal(size=(n, s, 14)).astype(np.float32))
    ray_diff = jnp.asarray(RNG.normal(size=(n, s, 4)).astype(np.float32))
    mask = jnp.asarray(RNG.uniform(size=(n, s)) > 0.2)
    ref = blending_net.apply(params, static, rgb_feat, ray_diff, mask)
    out = blending_net.apply(params, static, rgb_feat, ray_diff, mask,
                             compute_dtype=jnp.bfloat16)
    assert out.dtype == ref.dtype
    # only the softmax blend weights see bf16; rgb stays f32, so the error
    # is bounded by the rgb scale * blend-weight error (~2-3% worst case on
    # these unit-normal inputs; real [0,1] colors see ~100x less absolute)
    scale = float(np.abs(np.asarray(ref)).max())
    assert float(np.abs(np.asarray(out) - np.asarray(ref)).max()) \
        < 3e-2 * scale
