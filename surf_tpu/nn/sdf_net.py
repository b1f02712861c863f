"""Volume-conditioned SDF MLP with SAL geometric initialization.

Functional re-design of the reference's SDFNetworkSparse
(models/modules/sdf_network.py:27-152):

  * positional encoding (multires=4) on xyz;
  * per-point features = concat of sparse trilinear lookups over the stage
    feature volumes (fine-to-coarse), appended to *every* hidden layer;
  * skip connection re-injecting the embedded input at layer 3 (÷ sqrt(2));
  * Softplus(beta=100) activations, weight norm on every linear;
  * geometric init: last layer ~ N(sqrt(pi)/sqrt(fan_in), 1e-4) with bias
    -0.5 so the initial SDF is an approximate unit sphere; all
    feature-channel input columns start at zero.

Outputs (n, d_out): SDF in channel 0 (divided by ``scale``), 128-d geometry
feature in the rest.

Gradients: the reference needs a custom CUDA double-backward kernel for
∇sdf and the Hessian-row-sum "smooth" term (sdf_network.py:129-152).  Here
both are plain nested ``jax.grad`` compositions — arbitrarily differentiable
through the sparse trilinear gathers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .core import linear_apply
from ..ops.embedder import embedder
from ..ops import sparse as sp


def _norm_cols(key, shape, std):
    return jax.random.normal(key, shape) * std


def init(key, conf):
    d_in = conf.get_int("d_in")
    d_out = conf.get_int("d_out")
    d_hidden = conf.get_int("d_hidden")
    n_layers = conf.get_int("n_layers")
    skip_in = tuple(conf.get_list("skip_in"))
    multires = conf.get_int("multires")
    bias = conf.get_float("bias")
    scale = conf.get_float("scale")
    geometric_init = conf.get_bool("geometric_init")
    weight_norm = conf.get_bool("weight_norm")
    feat_channels = conf.get_int("feat_channels")
    feat_multires = conf.get_int("feat_multires", default=0)
    inside_outside = conf.get_bool("inside_outside", default=False)

    embed_fn, d_embed = embedder(multires, d_in)
    feat_embed_fn, feat_ch_emb = embedder(feat_multires, feat_channels)

    dims = [d_embed] + [d_hidden + feat_ch_emb for _ in range(n_layers)] + [d_out]
    num_layers = len(dims)

    layers = []
    keys = jax.random.split(key, num_layers - 1)
    for l in range(num_layers - 1):
        if l + 1 in skip_in:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
        if l < num_layers - 2:
            out_dim = out_dim - feat_ch_emb
        in_dim = dims[l]

        kw = keys[l]
        if geometric_init:
            if l == num_layers - 2:
                sign = -1.0 if inside_outside else 1.0
                w = sign * math.sqrt(math.pi) / math.sqrt(in_dim) + \
                    _norm_cols(kw, (in_dim, out_dim), 1e-4)
                b = jnp.full((out_dim,), -sign * bias)
                # feature-channel input columns start at zero
                # (sdf_network.py:71); the reference also zeroes the *last*
                # feat_channels entries of the bias (line 72) — replicated.
                w = w.at[-feat_ch_emb:, :].set(0.0)
                b = b.at[-feat_ch_emb:].set(0.0)
            elif multires > 0 and l == 0:
                w = jnp.zeros((in_dim, out_dim))
                w = w.at[:3, :].set(_norm_cols(kw, (3, out_dim),
                                               math.sqrt(2) / math.sqrt(out_dim)))
                b = jnp.zeros((out_dim,))
            elif multires > 0 and l in skip_in:
                w = _norm_cols(kw, (in_dim, out_dim), math.sqrt(2) / math.sqrt(out_dim))
                w = w.at[-(dims[0] - 3 + feat_ch_emb):, :].set(0.0)
                b = jnp.zeros((out_dim,))
            else:
                w = _norm_cols(kw, (in_dim, out_dim), math.sqrt(2) / math.sqrt(out_dim))
                w = w.at[-feat_ch_emb:, :].set(0.0)
                b = jnp.zeros((out_dim,))
        else:
            w = _norm_cols(kw, (in_dim, out_dim), 1.0 / math.sqrt(in_dim))
            b = jnp.zeros((out_dim,))

        if weight_norm:
            layers.append({"v": w, "g": jnp.linalg.norm(w, axis=0), "b": b})
        else:
            layers.append({"w": w, "b": b})

    params = {"layers": layers}
    static = {
        "skip_in": skip_in,
        "scale": scale,
        "multires": multires,
        "feat_multires": feat_multires,
        "feat_channels": feat_channels,
        "num_layers": num_layers,
    }
    return params, static


def lookup_stage_features(pts, stages):
    """Concat sparse trilinear lookups over the cascade stages.

    stages: sequence of (VoxelGrid, storage (P*8, c)) fine-to-coarse (the
    reference passes volumes_all[::-1], surf.py:159).
    """
    feats = [sp.sparse_trilinear(grid, storage, pts) for grid, storage in stages]
    return jnp.concatenate(feats, axis=-1)


def _softplus100(x):
    scaled = x * 100.0
    return jnp.where(scaled > 20.0, x, jax.nn.softplus(scaled) / 100.0)


def apply(params, static, pts, stages):
    """pts (n, 3) -> (n, d_out): [sdf, geometry features]."""
    feats = lookup_stage_features(pts, stages)
    if static["feat_multires"] > 0:
        fe, _ = embedder(static["feat_multires"], static["feat_channels"])
        feats = fe(feats)
    x_in = pts * static["scale"]
    if static["multires"] > 0:
        embed_fn, _ = embedder(static["multires"], pts.shape[-1])
        x_in = embed_fn(x_in)

    x = x_in
    num_layers = static["num_layers"]
    for l, lin in enumerate(params["layers"]):
        if l in static["skip_in"]:
            x = jnp.concatenate([x, x_in], axis=-1) / math.sqrt(2)
        if 0 < l < num_layers - 1:
            x = jnp.concatenate([x, feats], axis=-1)
        x = linear_apply(lin, x)
        if l < num_layers - 2:
            x = _softplus100(x)
    sdf = x[:, :1] / static["scale"]
    return jnp.concatenate([sdf, x[:, 1:]], axis=-1)


def sdf_only(params, static, pts, stages):
    return apply(params, static, pts, stages)[:, :1]


def gradient(params, static, pts, stages):
    """Per-point (∇sdf (n,3), smooth (n,3)) where smooth = H @ 1 — the exact
    quantities the reference extracts via nested autograd
    (sdf_network.py:129-152).

    Computed in BATCH form: per-point outputs depend only on their own
    point, so grad of sum(sdf) w.r.t. the batch IS the per-point gradient,
    and jvp of that grad-fn with an all-ones tangent IS the per-point H@1.
    One forward-over-reverse pass with clean (n, C) intermediates — the
    per-point vmap(jvp(grad)) formulation lowers to (n,1,1,k)-shaped temps
    that TPU pads 16x on the lane dimension."""

    def sdf_sum(p):
        return apply(params, static, p, stages)[:, 0].sum()

    grads, smooth = jax.jvp(jax.grad(sdf_sum), (pts,), (jnp.ones_like(pts),))
    return grads, smooth


def value_features_grads(params, static, pts, stages, *, chunk=None):
    """Fused per-point evaluation: (out (n, d_out), ∇sdf (n,3), H@1 (n,3)).

    One batch jvp-over-grad pass shares the forward work that the reference
    spends three separate autograd graphs on (implicit_surface.py:91-103);
    see ``gradient`` for why batch form (grad of the summed SDF) gives the
    per-point quantities exactly.

    ``chunk``: evaluate in sequential point chunks (lax.map with remat'd
    bodies) — at validation scale (4096 rays x 136 samples) the unchunked
    batch residuals alone are several GB and tip a 704^3-protocol render
    over HBM.
    """

    def fused(p):
        def g_with_aux(q):
            out = apply(params, static, q, stages)
            return out[:, 0].sum(), out

        grad_fn = jax.grad(g_with_aux, has_aux=True)
        (g, out), (hd, _) = jax.jvp(grad_fn, (p,), (jnp.ones_like(p),))
        return out, g, hd

    n = pts.shape[0]
    if chunk is None or n <= chunk:
        return fused(pts)
    pad = (-n) % chunk
    ptsp = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)]) if pad else pts
    # remat the chunk body: without it the outer (training) backward stacks
    # every chunk's residuals and the chunking saves nothing
    out = jax.lax.map(jax.checkpoint(fused), ptsp.reshape(-1, chunk, 3))
    return jax.tree.map(lambda o: o.reshape(-1, *o.shape[2:])[:n], out)
