"""Golden tests pinning the torch->surf_tpu weight mappings: each layer,
loaded with converted torch weights, must reproduce the torch layer."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as TF

from surf_tpu.nn.core import (
    conv2d_apply, conv2d_transpose_apply, linear_apply, instance_norm_2d,
    conv3d_apply, conv3d_transpose_apply, softplus_beta,
)

RNG = np.random.RandomState(3)


def test_linear_mapping():
    lin = nn.Linear(7, 5)
    x = RNG.randn(4, 7).astype(np.float32)
    ours = linear_apply({"w": jnp.asarray(lin.weight.detach().numpy().T),
                         "b": jnp.asarray(lin.bias.detach().numpy())},
                        jnp.asarray(x))
    ref = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_weight_norm_linear_mapping():
    lin = nn.utils.weight_norm(nn.Linear(6, 4))
    x = RNG.randn(3, 6).astype(np.float32)
    p = {"v": jnp.asarray(lin.weight_v.detach().numpy().T),
         "g": jnp.asarray(lin.weight_g.detach().numpy().reshape(-1)),
         "b": jnp.asarray(lin.bias.detach().numpy())}
    ours = linear_apply(p, jnp.asarray(x))
    ref = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_conv2d_mapping():
    conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
    x = RNG.randn(2, 3, 13, 17).astype(np.float32)
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    ours = conv2d_apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)), stride=2)
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_conv2d_transpose_mapping():
    conv = nn.ConvTranspose2d(6, 4, 3, stride=2, padding=1, output_padding=1)
    x = RNG.randn(1, 6, 9, 11).astype(np.float32)
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 0, 1)),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    ours = conv2d_transpose_apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  stride=2, padding=1, output_padding=1)
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_conv3d_mapping():
    conv = nn.Conv3d(4, 6, 3, stride=2, padding=1, bias=False)
    x = RNG.randn(1, 4, 8, 8, 8).astype(np.float32)
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0))}
    ours = conv3d_apply(p, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), stride=2)
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_conv3d_transpose_mapping():
    conv = nn.ConvTranspose3d(6, 3, 3, stride=2, padding=1, output_padding=1,
                              bias=False)
    x = RNG.randn(1, 6, 4, 4, 4).astype(np.float32)
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 4, 0, 1))}
    ours = conv3d_transpose_apply(p, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), stride=2)
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 4, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_instance_norm_matches_torch():
    x = RNG.randn(2, 3, 10, 12).astype(np.float32)
    ref = nn.InstanceNorm2d(3)(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    ours = instance_norm_2d(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_softplus_beta_matches_torch():
    x = RNG.randn(100).astype(np.float32) * 0.2
    ref = TF.softplus(torch.from_numpy(x), beta=100).numpy()
    ours = softplus_beta(jnp.asarray(x), beta=100.0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_converter_shapes():
    """Converted synthetic state dict produces the right pytree shapes."""
    from surf_tpu.convert.torch_converter import convert_checkpoint

    sd = {}
    d_base, d_in = 8, 3
    for i in range(4):
        dim = d_base * 2 ** i
        cin = d_in if i == 0 else d_base * 2 ** (i - 1)
        sd[f"feature_network.encoder_layers.{i}.0.conv.weight"] = \
            np.zeros((dim, cin, 3, 3), np.float32)
        sd[f"feature_network.encoder_layers.{i}.1.conv.weight"] = \
            np.zeros((dim, dim, 3, 3), np.float32)
        sd[f"feature_network.out_layers.{i}.weight"] = np.zeros((4, dim, 3, 3), np.float32)
        if i < 3:
            sd[f"feature_network.decoder_layers.{i}.conv.weight"] = \
                np.zeros((d_base * 2 ** (i + 1), d_base * 2 ** i, 3, 3), np.float32)
    for k in list(sd.keys()):
        sd[k.replace("feature_network", "match_feature_network", 1)] = sd[k]
    sd["volume.agg_mlp.0.weight"] = np.zeros((8, 4), np.float32)
    sd["volume.agg_mlp.0.bias"] = np.zeros(8, np.float32)
    sd["volume.agg_mlp.2.weight"] = np.zeros((1, 8), np.float32)
    sd["volume.agg_mlp.2.bias"] = np.zeros(1, np.float32)
    specs = [(8, 8), (8, 16), (16, 16), (16, 32), (32, 32), (32, 64), (64, 64),
             (64, 32), (32, 16), (16, 8)]
    names = ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6",
             "conv7", "conv9", "conv11"]
    for s in range(4):
        cin0 = 8 if s == 0 else 16
        for n, (ci, co) in zip(names, specs):
            ci = cin0 if n == "conv0" else ci
            sd[f"reg_network.nets.{s}.{n}.net.0.kernel"] = \
                np.zeros((27, ci, co), np.float32)
            for stat in ["weight", "bias", "running_mean", "running_var"]:
                sd[f"reg_network.nets.{s}.{n}.net.1.{stat}"] = np.zeros(co, np.float32)
        sd[f"reg_network.nets.{s}.out_lin.weight"] = np.zeros((8, 8), np.float32)
    dims_in = [27, 156, 156, 128 + 28, 156, 156, 156]
    dims_out = [128, 128, 101, 128, 128, 128, 129]
    for l, (ci, co) in enumerate(zip(dims_in, dims_out)):
        sd[f"implicit_surface.sdf_network.lin{l}.weight_v"] = np.zeros((co, ci), np.float32)
        sd[f"implicit_surface.sdf_network.lin{l}.weight_g"] = np.zeros((co, 1), np.float32)
        sd[f"implicit_surface.sdf_network.lin{l}.bias"] = np.zeros(co, np.float32)
    for name, dims in [("ray_dir_fc", [(16, 4), (19, 16)]),
                       ("base_fc", [(64, 57), (32, 64)]),
                       ("vis_fc", [(32, 32), (33, 32)]),
                       ("vis_fc2", [(32, 32), (1, 32)]),
                       ("rgb_fc", [(16, 37), (8, 16), (1, 8)])]:
        for j, (o, i) in enumerate(dims):
            sd[f"implicit_surface.color_network.{name}.{j * 2}.weight"] = \
                np.zeros((o, i), np.float32)
            sd[f"implicit_surface.color_network.{name}.{j * 2}.bias"] = \
                np.zeros(o, np.float32)
    sd["implicit_surface.color_network.s"] = np.asarray(0.2, np.float32)
    sd["implicit_surface.deviation_network.variance"] = np.asarray(0.3, np.float32)

    params, state = convert_checkpoint(sd)
    assert params["feature_network"]["encoder"][0]["c0"]["w"].shape == (3, 3, 3, 8)
    assert params["feature_network"]["decoder"][0]["w"].shape == (3, 3, 16, 8)
    assert params["reg_network"][1]["conv0"]["conv"]["w"].shape == (3, 3, 3, 16, 8)
    assert params["reg_network"][0]["conv7"]["conv"]["w"].shape == (3, 3, 3, 64, 32)
    assert params["implicit_surface"]["sdf_network"]["layers"][0]["v"].shape == (27, 128)
    assert params["implicit_surface"]["color_network"]["rgb_fc"][2]["w"].shape == (8, 1)
    assert state["reg_network"][0]["conv0"]["bn"]["mean"].shape == (8,)


def test_geocheck_depths_consistency():
    """Port of the unused depth_filtering_geocheck (reference
    volume.py:170-238): cross-view-consistent depths pass unchanged, a
    corrupted view is zeroed."""
    import jax.numpy as jnp
    from surf_tpu.nn.volume import geocheck_depths, depth_consistency_geocheck

    H, W, nv = 24, 32, 3
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    intrs = np.stack([K] * nv)
    c2ws = np.stack([np.eye(4, dtype=np.float32) for _ in range(nv)])
    c2ws[1][0, 3] = 0.05   # small x translations
    c2ws[2][0, 3] = -0.05
    # fronto-parallel plane at z=2: every view sees constant depth 2
    depths = np.full((nv, H, W), 2.0, np.float32)

    out = np.asarray(geocheck_depths(
        jnp.asarray(depths), jnp.asarray(intrs), jnp.asarray(c2ws)))
    # borders can reproject outside the neighboring views (masked, as in
    # the reference); the interior passes through unchanged
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], depths[:, 2:-2, 2:-2],
                               atol=1e-4)

    bad = depths.copy()
    bad[2] = 7.0           # inconsistent third view
    out2 = np.asarray(geocheck_depths(
        jnp.asarray(bad), jnp.asarray(intrs), jnp.asarray(c2ws)))
    np.testing.assert_allclose(out2[:2, 2:-2, 2:-2], bad[:2, 2:-2, 2:-2],
                               atol=1e-4)
    # interior of the bad view is zeroed (borders can alias via clamping)
    assert np.abs(out2[2, 4:-4, 4:-4]).max() < 1e-6

    # voxel filter runs against the masked depths
    pts = jnp.asarray(np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]], np.float32))
    counts, keep = depth_consistency_geocheck(
        pts, jnp.asarray(np.array([True, True])), jnp.asarray(bad),
        jnp.asarray(intrs), jnp.asarray(c2ws), 0.3)
    assert bool(keep[0]) and not bool(keep[1])


def test_consistency_loss_zero_for_consistent_depths():
    """Unused consistency loss (consistency_loss.py:5-58): two views of a
    fronto-parallel plane agree exactly -> near-zero loss; a corrupted
    source depth raises it."""
    import jax.numpy as jnp
    from surf_tpu.losses.consistency import compute_consistency_loss

    H, W = 20, 28
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 30.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    c2ws = np.stack([np.eye(4, dtype=np.float32) for _ in range(2)])
    c2ws[1][0, 3] = 0.05
    depth = np.full((H, W), 2.0, np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[3:-3, 3:-3] = 1.0  # interior (borders reproject outside)

    loss = float(compute_consistency_loss(
        jnp.asarray(depth), jnp.asarray(depth),
        jnp.asarray(np.stack([K, K])), jnp.asarray(c2ws), 1,
        jnp.asarray(mask), jnp.asarray(mask)))
    assert loss < 1e-5, loss

    loss_bad = float(compute_consistency_loss(
        jnp.asarray(depth), jnp.asarray(depth * 1.008),
        jnp.asarray(np.stack([K, K])), jnp.asarray(c2ws), 1,
        jnp.asarray(mask), jnp.asarray(mask)))
    assert loss_bad > loss
