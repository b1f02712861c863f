"""MNASNet-backed 5-level feature pyramid (unused alternative backbone).

Port of the reference's models/modules/feature_network_mnasnet.py:52-103:
a torchvision MNASNet-1.0 trunk sliced into 5 encoder stages
(children [0:8], [8:9], [9:10], [10:12], [12:14] of ``mnasnet1_0().layers``)
feeding a transposed-conv FPN decoder with additive skips and per-level
3x3 output heads (fine to coarse, ``d_out`` per level).

The trunk is implemented natively (torchvision is not a dependency):
MNASNet-1.0 = conv stem (3->32 s2, depthwise 3x3, 1x1 -> 16) followed by
six inverted-residual stacks
    (16->24, k3, s2, e3, r3) (24->40, k5, s2, e3, r3)
    (40->80, k5, s2, e6, r3) (80->96, k3, s1, e6, r2)
    (96->192, k5, s2, e6, r4) (192->320, k3, s1, e6, r1),
batch-norm in inference form (scale/shift with stored statistics, eps
1e-5 as torchvision).  Weight layout maps 1:1 onto the torchvision
state_dict for checkpoint conversion (convert/torch_converter.py applies
the same HWIO transposition rules as the main FPN converter).

Like the reference file, nothing in the pipeline instantiates this
backbone — it is the faithful port of an unused variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import (conv2d_init, conv2d_apply, conv2d_transpose_init,
                   conv2d_transpose_apply, instance_norm_2d, relu)

# (c_out, kernel, stride, expansion, repeats) per inverted-residual stack
_STACKS = [
    (24, 3, 2, 3, 3),
    (40, 5, 2, 3, 3),
    (80, 5, 2, 6, 3),
    (96, 3, 1, 6, 2),
    (192, 5, 2, 6, 4),
    (320, 3, 1, 6, 1),
]


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn_apply(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _dw_init(key, c, k):
    # depthwise: HWIO with feature_group_count=c -> (k, k, 1, c)
    fan_in = k * k
    from .core import kaiming_uniform_torch
    return {"w": kaiming_uniform_torch(key, (k, k, 1, c), fan_in, jnp.float32)}


def _dw_apply(p, x, *, stride=1):
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _ir_init(key, c_in, c_out, k, expansion):
    mid = c_in * expansion
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "expand": conv2d_init(k1, c_in, mid, 1, bias=False),
        "bn1": _bn_init(mid),
        "dw": _dw_init(k2, mid, k),
        "bn2": _bn_init(mid),
        "project": conv2d_init(k3, mid, c_out, 1, bias=False),
        "bn3": _bn_init(c_out),
    }


def _ir_apply(p, x, *, stride):
    y = relu(_bn_apply(p["bn1"], conv2d_apply(p["expand"], x)))
    y = relu(_bn_apply(p["bn2"], _dw_apply(p["dw"], y, stride=stride)))
    y = _bn_apply(p["bn3"], conv2d_apply(p["project"], y))
    if stride == 1 and x.shape[-1] == y.shape[-1]:
        y = y + x
    return y


def init(key, conf):
    """conf: needs ``d_out`` with 5 entries (fine to coarse)."""
    d_out = conf.get_list("d_out")
    assert len(d_out) == 5, "mnasnet FPN emits 5 levels"
    keys = iter(jax.random.split(key, 64))

    params = {"stem": {
        "conv0": conv2d_init(next(keys), 3, 32, 3, bias=False),
        "bn0": _bn_init(32),
        "dw": _dw_init(next(keys), 32, 3),
        "bn1": _bn_init(32),
        "proj": conv2d_init(next(keys), 32, 16, 1, bias=False),
        "bn2": _bn_init(16),
    }}
    c_in = 16
    stacks = []
    for c_out, k, s, e, r in _STACKS:
        blocks = []
        for i in range(r):
            blocks.append(_ir_init(next(keys), c_in if i == 0 else c_out,
                                   c_out, k, e))
            c_in = c_out
        stacks.append(blocks)
    params["stacks"] = stacks

    # decoder (reference lines 66-76): 320->96->40->24->16->8 deconvs with
    # InstanceNorm+ReLU, then bias-free 3x3 heads
    dec_specs = [(320, 96), (96, 40), (40, 24), (24, 16), (16, 8)]
    params["decod"] = [conv2d_transpose_init(next(keys), ci, co, 3, bias=False)
                       for ci, co in dec_specs]
    head_cs = [96, 40, 24, 16, 8]
    params["out"] = [conv2d_init(next(keys), c, d, 3, bias=False)
                     for c, d in zip(head_cs, d_out[::-1])]
    return params


def apply(params, imgs):
    """imgs (nv, H, W, 3) -> 5 feature maps FINE TO COARSE (the reference
    returns [out1..out5] fine-first, feature_network_mnasnet.py:99-101)."""
    st = params["stem"]
    x = relu(_bn_apply(st["bn0"], conv2d_apply(st["conv0"], imgs, stride=2)))
    x = relu(_bn_apply(st["bn1"], _dw_apply(st["dw"], x)))
    enc1 = _bn_apply(st["bn2"], conv2d_apply(st["proj"], x))     # 16ch /2

    feats = [enc1]
    x = enc1
    for blocks, (c_out, k, s, e, r) in zip(params["stacks"], _STACKS):
        for i, bp in enumerate(blocks):
            x = _ir_apply(bp, x, stride=s if i == 0 else 1)
        feats.append(x)
    # encoder taps mirroring the reference slices: enc2 = stack0 (24ch /4),
    # enc3 = stack1 (40ch /8), enc4 = stacks 2-3 (96ch /16),
    # enc5 = stacks 4-5 (320ch /32)
    enc2, enc3 = feats[1], feats[2]
    enc4, enc5 = feats[4], feats[6]

    def deconv(p, x):
        return relu(instance_norm_2d(conv2d_transpose_apply(
            p, x, stride=2, padding=1, output_padding=1)))

    dec5 = deconv(params["decod"][0], enc5) + enc4
    dec4 = deconv(params["decod"][1], dec5) + enc3
    dec3 = deconv(params["decod"][2], dec4) + enc2
    dec2 = deconv(params["decod"][3], dec3) + enc1
    dec1 = deconv(params["decod"][4], dec2)

    decs = [dec1, dec2, dec3, dec4, dec5]
    outs = [conv2d_apply(p, d) for p, d in zip(params["out"][::-1], decs)]
    return outs  # fine to coarse
