"""Multi-scale FPN image encoder.

Functional re-design of the reference FeatureNetwork
(models/modules/feature_network.py:126-178): a 4-stage encoder
(stride 1,2,2,2; each stage = two 3x3 conv + InstanceNorm + ReLU blocks),
a transposed-conv decoder with additive skips, and a per-stage 3x3 output
head (bias-free).  Returns feature maps **low-res -> high-res**
(1/8, 1/4, 1/2, 1/1 of input), `d_out` channels each.

Activations are channel-last (N, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import (
    conv2d_init, conv2d_apply, conv2d_transpose_init, conv2d_transpose_apply,
    instance_norm_2d, relu,
)


def _conv_block_init(key, c_in, c_out, k):
    # Conv + InstanceNorm(affine=False) + ReLU: conv has no bias (bn present)
    return conv2d_init(key, c_in, c_out, k, bias=False)


def _conv_block_apply(p, x, *, stride=1):
    return relu(instance_norm_2d(conv2d_apply(p, x, stride=stride)))


def init(key, conf):
    d_in = conf.get_int("d_in")
    d_base = conf.get_int("d_base")
    d_outs = conf.get_list("d_out")
    num_stage = len(d_outs)

    params = {"encoder": [], "decoder": [], "out": []}
    keys = jax.random.split(key, num_stage * 4)
    ki = 0
    c_in = d_in
    for i in range(num_stage):
        dim_m = d_base * 2 ** i
        enc = {
            "c0": _conv_block_init(keys[ki], c_in, dim_m, 3),
            "c1": _conv_block_init(keys[ki + 1], dim_m, dim_m, 3),
        }
        ki += 2
        params["encoder"].append(enc)
        c_in = dim_m
        params["out"].append(conv2d_init(keys[ki], dim_m, d_outs[i], 3, bias=False))
        ki += 1
        if i < num_stage - 1:
            params["decoder"].append(
                conv2d_transpose_init(keys[ki], d_base * 2 ** (i + 1), d_base * 2 ** i, 3, bias=False))
            ki += 1
    return params


def init_legacy(key, conf):
    """Alternative 3-scale backbone matching the reference's unused
    FeatureNetworkOld (feature_network.py:78-123): conv0 (stride 1, 5x5
    downsamplers) encoder, lateral 3x3 inner convs, bilinear-upsample FPN
    with three d_out heads.  Kept for checkpoint/experiment parity."""
    d_base = conf.get_int("d_base")
    d_out = conf.get_int("d_out") if not isinstance(conf.get("d_out"), list) \
        else conf.get_list("d_out")[0]
    keys = jax.random.split(key, 12)
    p = {
        "conv0": [_conv_block_init(keys[0], 3, d_base, 3),
                  _conv_block_init(keys[1], d_base, d_base, 3)],
        "conv1": [_conv_block_init(keys[2], d_base, d_base * 2, 5),
                  _conv_block_init(keys[3], d_base * 2, d_base * 2, 3),
                  _conv_block_init(keys[4], d_base * 2, d_base * 2, 3)],
        "conv2": [_conv_block_init(keys[5], d_base * 2, d_base * 4, 5),
                  _conv_block_init(keys[6], d_base * 4, d_base * 4, 3),
                  _conv_block_init(keys[7], d_base * 4, d_base * 4, 3)],
        "out2": conv2d_init(keys[8], d_base * 4, d_out, 3, bias=False),
        "out1": conv2d_init(keys[9], d_base * 4, d_out, 3, bias=False),
        "out0": conv2d_init(keys[10], d_base * 4, d_out, 3, bias=False),
        "inner1": conv2d_init(keys[11], d_base * 2, d_base * 4, 3, bias=False),
        "inner0": conv2d_init(jax.random.split(keys[11])[0], d_base, d_base * 4, 3,
                              bias=False),
    }
    return p


def apply_legacy(params, images):
    from ..ops import resize_bilinear_2d

    def seq(blocks, x, strides):
        for p, s in zip(blocks, strides):
            x = _conv_block_apply(p, x, stride=s)
        return x

    feat0 = seq(params["conv0"], images, [1, 1])
    feat1 = seq(params["conv1"], feat0, [2, 1, 1])
    feat2 = seq(params["conv2"], feat1, [2, 1, 1])
    out2 = conv2d_apply(params["out2"], feat2)
    up = jax.vmap(lambda m: resize_bilinear_2d(
        m, (feat1.shape[1], feat1.shape[2]), align_corners=True))(feat2)
    intra = up + conv2d_apply(params["inner1"], feat1)
    out1 = conv2d_apply(params["out1"], intra)
    up = jax.vmap(lambda m: resize_bilinear_2d(
        m, (feat0.shape[1], feat0.shape[2]), align_corners=True))(intra)
    intra = up + conv2d_apply(params["inner0"], feat0)
    out0 = conv2d_apply(params["out0"], intra)
    return [out2, out1, out0]


def apply(params, images):
    """images: (nv, H, W, 3) -> list of (nv, h_s, w_s, c) low-res -> high-res."""
    num_stage = len(params["encoder"])
    x = images
    e_outs = []
    for i in range(num_stage):
        stride = 2 if i > 0 else 1
        x = _conv_block_apply(params["encoder"][i]["c0"], x, stride=stride)
        x = _conv_block_apply(params["encoder"][i]["c1"], x, stride=1)
        e_outs.append(x)

    d_outs = [e_outs[-1]]
    for i in range(num_stage - 2, -1, -1):
        up = conv2d_transpose_apply(params["decoder"][i], d_outs[-1],
                                    stride=2, padding=1, output_padding=1)
        up = relu(instance_norm_2d(up))
        d_outs.append(up + e_outs[i])
    d_outs = d_outs[::-1]  # finest first

    outs = [conv2d_apply(params["out"][i], d_outs[i]) for i in range(num_stage)]
    return outs[::-1]  # low-res -> high-res
