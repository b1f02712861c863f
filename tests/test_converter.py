"""Activation-matching validation of the torch->jax checkpoint converter.

The reference's headline Chamfer number flows through its published torch
checkpoint, so the converter's layout mappings must be provably right.
Strategy: random-initialize the *reference* torch modules on CPU (importable
ones are imported read-only from /root/reference; the SDF MLP is rebuilt with
torch.nn primitives because importing the reference module JIT-compiles a
CUDA extension), run both frameworks on the same inputs, and assert the
converted params reproduce the torch activations to ~1e-5.

Covered mappings (convert/torch_converter.py):
  Linear transpose, Conv2d NCHW->HWIO, ConvTranspose2d + InstanceNorm,
  weight-norm folding (g, v), blending MLP stacks + anti-alias s, agg_mlp.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# read-only import of the reference torch modules (pure-torch ones only)
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from surf_tpu.convert.torch_converter import (
    convert_feature_network, convert_blending_network, convert_sdf_network,
    _lin, _sparse_conv3d)
from surf_tpu.nn import feature_net, blending_net, sdf_net
from surf_tpu.nn.core import linear_apply, elu, conv3d_apply


class _Conf(dict):
    """Minimal pyhocon-like shim for the reference modules' conf API."""

    def get_int(self, k):
        return int(self[k])

    def get_list(self, k, default=None):
        v = self.get(k)
        return default if v is None else v

    def get_float(self, k):
        return float(self[k])


def _prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


@pytest.mark.parametrize("num_stage", [4])
def test_feature_network_activations(num_stage):
    from models.modules.feature_network import FeatureNetwork

    torch.manual_seed(0)
    conf = _Conf(d_in=3, d_base=8, d_out=[4] * num_stage)
    net = FeatureNetwork(conf).eval()

    x = torch.randn(2, 3, 64, 80)
    with torch.no_grad():
        ref_maps = net(x)                       # list low-res -> high-res

    params = convert_feature_network(_prefix_sd(net, "feature_network"),
                                     "feature_network", num_stage)
    params = jax.tree.map(jnp.asarray, params)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = feature_net.apply(params, x_jax)      # list low-res -> high-res

    assert len(got) == len(ref_maps) == num_stage
    for g, r in zip(got, ref_maps):
        r_np = r.numpy().transpose(0, 2, 3, 1)
        assert g.shape == r_np.shape
        np.testing.assert_allclose(np.asarray(g), r_np, atol=2e-5, rtol=1e-4)


def test_blending_network_activations():
    from models.modules.blending_network import BlendingNetwork

    torch.manual_seed(1)
    d_feature = 16
    net = BlendingNetwork(d_feature=d_feature).eval()

    n, nsrc = 64, 3
    rgb_feat = torch.randn(n, nsrc, 3 + d_feature)
    ray_diff = torch.randn(n, nsrc, 4)
    mask = torch.rand(n, nsrc) > 0.2
    # keep at least one visible view per sample (all-masked rows softmax over
    # -1e9s in both frameworks; numerically fine but pointless to compare)
    mask[:, 0] = True
    with torch.no_grad():
        ref = net(rgb_feat, ray_diff, mask.float()).numpy()

    p = convert_blending_network(
        _prefix_sd(net, "implicit_surface.color_network"),
        "implicit_surface.color_network")
    p = jax.tree.map(jnp.asarray, p)
    static = {"anti_alias_pooling": True}
    got = blending_net.apply(p, static, jnp.asarray(rgb_feat.numpy()),
                             jnp.asarray(ray_diff.numpy()),
                             jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


def test_agg_mlp_activations():
    from models.modules.volume import Volume

    torch.manual_seed(2)
    conf = _Conf(base_volume_dim=[16, 16, 16])
    vol = Volume(conf).eval()

    sd = _prefix_sd(vol, "volume")
    p = [_lin(sd, "volume.agg_mlp.0"), _lin(sd, "volume.agg_mlp.2")]
    p = jax.tree.map(jnp.asarray, p)

    x = torch.randn(5, 100, 4)
    with torch.no_grad():
        ref = vol.agg_mlp(x).numpy()
    got = linear_apply(p[1], elu(linear_apply(p[0], jnp.asarray(x.numpy()))))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6, rtol=1e-5)


def _torch_sdf_mlp(d_in=3, d_out=129, d_hidden=128, n_layers=6, skip_in=(3,),
                   multires=4, feat_channels=28):
    """The reference SDFNetworkSparse layer stack (sdf_network.py:27-127)
    rebuilt from torch.nn primitives (importing the reference module triggers
    a CUDA cpp_extension build).  Random init (geometric init fidelity is
    covered by property tests); weight-norm applied like the reference."""
    d_embed = d_in + d_in * 2 * multires
    dims = [d_embed] + [d_hidden + feat_channels for _ in range(n_layers)] + [d_out]
    layers = []
    for l in range(len(dims) - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        if l < len(dims) - 2:
            out_dim -= feat_channels
        lin = torch.nn.Linear(dims[l], out_dim)
        # fan-in-scaled init keeps activations O(1) like a trained net —
        # large random weights amplify fp32 reassociation noise across the
        # 6-layer chain and drown the layout check
        torch.nn.init.normal_(lin.weight, 0.0, 1.0 / np.sqrt(dims[l]))
        torch.nn.init.normal_(lin.bias, 0.0, 0.1)
        layers.append(torch.nn.utils.weight_norm(lin))
    return layers, dims


def _torch_embed(x, multires):
    outs = [x]
    for i in range(multires):
        f = 2.0 ** i
        outs += [torch.sin(x * f), torch.cos(x * f)]
    return torch.cat(outs, dim=-1)


def test_sdf_mlp_weight_norm_activations():
    """Forward parity of the weight-norm SDF MLP: torch reference semantics
    (sdf_network.py:105-122: skip re-inject /sqrt(2), feats concatenated at
    every hidden layer, Softplus beta=100) vs sdf_net.apply with the
    converted {v, g, b} params."""
    torch.manual_seed(3)
    n_layers, skip_in, multires, feat_channels = 6, (3,), 4, 28
    layers, dims = _torch_sdf_mlp(n_layers=n_layers, skip_in=skip_in,
                                  multires=multires,
                                  feat_channels=feat_channels)
    act = torch.nn.Softplus(beta=100)

    n = 64
    pts = torch.rand(n, 3) * 2 - 1
    feats = torch.randn(n, feat_channels)

    with torch.no_grad():
        inputs = _torch_embed(pts, multires)
        x = inputs
        for l, lin in enumerate(layers):
            if l in skip_in:
                x = torch.cat([x, inputs], -1) / np.sqrt(2)
            if 0 < l < len(dims) - 1:
                x = torch.cat([x, feats], -1)
            x = lin(x)
            if l < len(dims) - 2:
                x = act(x)
        ref = torch.cat([x[:, :1], x[:, 1:]], dim=-1).numpy()

    sd = {}
    for l, lin in enumerate(layers):
        for k, v in lin.state_dict().items():
            sd[f"implicit_surface.sdf_network.lin{l}.{k}"] = v.detach().numpy()
    params = convert_sdf_network(sd, "implicit_surface.sdf_network",
                                 n_layers=len(layers))
    params = jax.tree.map(jnp.asarray, params)

    static = {"skip_in": skip_in, "scale": 1.0, "multires": multires,
              "feat_multires": 0, "feat_channels": feat_channels,
              "num_layers": len(dims)}

    # bypass the volume lookup: inject the same precomputed features
    import surf_tpu.nn.sdf_net as sn
    orig = sn.lookup_stage_features
    sn.lookup_stage_features = lambda p, stages: jnp.asarray(feats.numpy())
    try:
        got = sdf_net.apply(params, static, jnp.asarray(pts.numpy()), [])
    finally:
        sn.lookup_stage_features = orig
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)


def test_sparse_conv3d_kernel_order():
    """Pin the torchsparse-2.1.0 tap order end-to-end (VERDICT r2 #3).

    torchsparse/nn/utils/kernel.py get_kernel_offsets (odd kernels):
        offsets = [[x, y, z] for z in zs for y in ys for x in xs]
    i.e. tap t -> offset (xs[t % k], ys[(t//k) % k], zs[t // k^2]), and the
    conv computes out[p] += W[t] @ in[p + offset_t].  A kernel constructed
    with exactly that enumeration, run through _sparse_conv3d, must
    reproduce the cross-correlation against torch's dense conv3d.
    """
    torch.manual_seed(4)
    k, cin, cout = 3, 4, 5
    w_flat = torch.randn(k ** 3, cin, cout)
    offs = [-1, 0, 1]

    # dense torch kernel assembled tap-by-tap with the torchsparse
    # enumeration.  torch conv3d computes (with flipped-kernel convention)
    # out[p] = sum_d W[:, :, d] x[p + d - 1]  (F.conv3d is cross-correlation)
    # so offset (ox,oy,oz) lands at kernel index (ox+1, oy+1, oz+1).
    w_dense = torch.zeros(cout, cin, k, k, k)
    for t in range(k ** 3):
        ox, oy, oz = offs[t % k], offs[(t // k) % k], offs[t // (k * k)]
        w_dense[:, :, ox + 1, oy + 1, oz + 1] = w_flat[t].T

    x = torch.randn(1, cin, 8, 8, 8)
    with torch.no_grad():
        ref = torch.nn.functional.conv3d(x, w_dense, padding=k // 2).numpy()

    conv = _sparse_conv3d({"p.kernel": w_flat.numpy()}, "p")
    got = conv3d_apply({"w": jnp.asarray(conv["w"])},
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref,
                               atol=1e-4, rtol=1e-4)


def test_feature_network_old_activations():
    """Activation parity of the legacy 3-scale FPN (FeatureNetworkOld,
    feature_network.py:78-123) vs feature_net.apply_legacy with converted
    params — upgrades the variant from 'ported' to 'activation-matched'."""
    from models.modules.feature_network import FeatureNetworkOld
    from surf_tpu.convert.torch_converter import convert_feature_network_old

    torch.manual_seed(5)
    conf = _Conf(d_base=8, d_out=4)
    net = FeatureNetworkOld(conf).eval()

    x = torch.randn(2, 3, 64, 80)
    with torch.no_grad():
        ref_maps = net(x)                  # [out2 (coarse), out1, out0]

    sd = _prefix_sd(net, "fn")
    params = convert_feature_network_old(sd, "fn")
    params = jax.tree.map(jnp.asarray, params)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    from surf_tpu.nn.feature_net import apply_legacy
    got = apply_legacy(params, x_jax)

    assert len(got) == len(ref_maps) == 3
    for g, r in zip(got, ref_maps):
        r_np = r.numpy().transpose(0, 2, 3, 1)
        assert g.shape == r_np.shape
        np.testing.assert_allclose(np.asarray(g), r_np, atol=3e-5, rtol=1e-4)
