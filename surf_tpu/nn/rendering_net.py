"""IDR-style per-point color MLP — the alternative color head the reference
keeps as a switchable option (models/modules/rendering_network.py:9-86,
selectable at implicit_surface.py:60-61).  Modes: 'idr' (points + view dirs
+ normals), 'no_view_dir', 'no_normal'; geometry features appended to every
hidden layer; weight-norm linears; optional view-dir positional encoding;
sigmoid output."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .core import linear_apply
from ..ops.embedder import embedder


def init(key, conf):
    d_feature = conf.get_int("d_feature")
    mode = conf.get_string("mode", default="idr")
    d_in = conf.get_int("d_in")
    d_out = conf.get_int("d_out")
    d_hidden = conf.get_int("d_hidden")
    n_layers = conf.get_int("n_layers")
    skip_in = tuple(conf.get_list("skip_in", default=[2]))
    weight_norm = conf.get_bool("weight_norm", default=True)
    multires_view = conf.get_int("multires_view", default=0)
    squeeze_out = conf.get_bool("squeeze_out", default=True)

    dims = [d_in] + [d_hidden + d_feature for _ in range(n_layers)] + [d_out]
    if multires_view > 0:
        _, view_ch = embedder(multires_view, 3)
        dims[0] += view_ch - 3

    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    num_layers = len(dims)
    for l in range(num_layers - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1 in skip_in) else dims[l + 1]
        if l < num_layers - 2:
            out_dim -= d_feature
        w = jax.random.normal(keys[l], (dims[l], out_dim)) / math.sqrt(dims[l])
        b = jnp.zeros((out_dim,))
        if weight_norm:
            layers.append({"v": w, "g": jnp.linalg.norm(w, axis=0), "b": b})
        else:
            layers.append({"w": w, "b": b})

    static = {"mode": mode, "skip_in": skip_in, "multires_view": multires_view,
              "squeeze_out": squeeze_out, "num_layers": num_layers}
    return {"layers": layers}, static


def apply(params, static, points, normals, view_dirs, feature_vectors):
    if static["multires_view"] > 0:
        embed_fn, _ = embedder(static["multires_view"], 3)
        view_dirs = embed_fn(view_dirs)
    mode = static["mode"]
    if mode == "idr":
        x_in = jnp.concatenate([points, view_dirs, normals], axis=-1)
    elif mode == "no_view_dir":
        x_in = jnp.concatenate([points, normals], axis=-1)
    elif mode == "no_normal":
        x_in = jnp.concatenate([points, view_dirs], axis=-1)
    else:
        raise ValueError(mode)

    x = x_in
    n = static["num_layers"]
    for l, lin in enumerate(params["layers"]):
        if l in static["skip_in"]:
            x = jnp.concatenate([x, x_in], axis=-1) / math.sqrt(2)
        if 0 < l < n - 1:
            x = jnp.concatenate([x, feature_vectors], axis=-1)
        x = linear_apply(lin, x)
        if l < n - 2:
            x = jax.nn.relu(x)
    if static["squeeze_out"]:
        x = jax.nn.sigmoid(x)
    return x
