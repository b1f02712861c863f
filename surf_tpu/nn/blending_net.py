"""IBRNet-style cross-view color blending head.

Functional re-design of the reference BlendingNetwork
(models/modules/blending_network.py:22-118): a ray-direction-difference MLP
added to per-view features, anti-alias pooling weights
``exp(|s| * (dot - 1))``, fused weighted mean/variance across source views,
two visibility MLPs, and a softmax blend over source-view RGBs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import linear_init, linear_apply, elu, kaiming_normal


def _mlp_init(key, dims, kaiming=True):
    keys = jax.random.split(key, len(dims) - 1)
    out = []
    for i, k in enumerate(keys):
        if kaiming:
            w_init = lambda kk, shape: kaiming_normal(kk, shape, shape[0])
            b_init = lambda kk, shape: jnp.zeros(shape)
            out.append(linear_init(k, dims[i], dims[i + 1], w_init=w_init, b_init=b_init))
        else:
            out.append(linear_init(k, dims[i], dims[i + 1]))
    return out


def init(key, conf):
    d_feature = conf.get_int("d_feature", default=16)
    anti_alias_pooling = conf.get_bool("anti_alias_pooling", default=True)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        # ray_dir_fc keeps torch's default init (reference line 36-39 has no
        # weights_init applied to it)
        "ray_dir_fc": _mlp_init(k1, [4, 16, d_feature + 3], kaiming=False),
        "base_fc": _mlp_init(k2, [(d_feature + 3) * 3, 64, 32]),
        "vis_fc": _mlp_init(k3, [32, 32, 33]),
        "vis_fc2": _mlp_init(k4, [32, 32, 1]),
        "rgb_fc": _mlp_init(k5, [32 + 1 + 4, 16, 8, 1]),
    }
    if anti_alias_pooling:
        params["s"] = jnp.asarray(0.2)
    static = {"anti_alias_pooling": anti_alias_pooling}
    return params, static


def _seq(layers, x, final_act=None):
    for i, p in enumerate(layers):
        x = linear_apply(p, x)
        if i < len(layers) - 1 or final_act == "elu_all":
            x = elu(x)
    return x


def apply(params, static, rgb_feat, ray_diff, mask, compute_dtype=None):
    """
    rgb_feat: (n, n_srcs, 3 + c)  — RGB first, then warped features
    ray_diff: (n, n_srcs, 4)
    mask:     (n, n_srcs) bool
    compute_dtype: optional (e.g. bfloat16) — run the blending MLPs in this
      dtype (value-only render paths; the blended output is cast back).
      The blend is a softmax-weighted mean of ORIGINAL-dtype source RGBs,
      so only the blend weights see the reduced precision.
    returns blended rgb (n, 3)
    """
    out_dtype = rgb_feat.dtype
    rgb_in = rgb_feat[..., :3]
    if compute_dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        rgb_feat = rgb_feat.astype(compute_dtype)
        ray_diff = ray_diff.astype(compute_dtype)
    m = mask[..., None].astype(rgb_feat.dtype)
    num_views = rgb_feat.shape[1]

    direction_feat = _seq(params["ray_dir_fc"], ray_diff, final_act="elu_all")
    rgb_feat = rgb_feat + direction_feat

    if static["anti_alias_pooling"]:
        dot = ray_diff[..., 3:4]
        exp_dot = jnp.exp(jnp.abs(params["s"]) * (dot - 1.0))
        weight = (exp_dot - jnp.min(exp_dot, axis=1, keepdims=True)) * m
        weight = weight / (jnp.sum(weight, axis=1, keepdims=True) + 1e-8)
    else:
        weight = m / (jnp.sum(m, axis=1, keepdims=True) + 1e-8)

    mean = jnp.sum(rgb_feat * weight, axis=1, keepdims=True)
    var = jnp.sum(weight * (rgb_feat - mean) ** 2, axis=1, keepdims=True)
    globalfeat = jnp.concatenate([mean, var], axis=-1)

    x = jnp.concatenate(
        [jnp.broadcast_to(globalfeat, (*globalfeat.shape[:1], num_views, globalfeat.shape[-1])),
         rgb_feat], axis=-1)
    x = _seq(params["base_fc"], x, final_act="elu_all")

    x_vis = _seq(params["vis_fc"], x * weight, final_act="elu_all")
    x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
    vis = jax.nn.sigmoid(vis) * m
    x = x + x_res
    vis = jax.nn.sigmoid(_seq(params["vis_fc2"], x * vis)) * m

    x = jnp.concatenate([x, vis, ray_diff], axis=-1)
    x = _seq(params["rgb_fc"], x)
    x = jnp.where(m == 0, -1e9, x)
    blending_weights = jax.nn.softmax(x, axis=1).astype(out_dtype)
    return jnp.sum(rgb_in * blending_weights, axis=1)
