"""Convert a reference (PyTorch) SuRF checkpoint into surf_tpu param pytrees.

Key-space documented from the reference module inventory (SURVEY.md §2.2):
  feature_network.encoder_layers.{i}.{0,1}.conv.weight        Conv2d, no bias
  feature_network.decoder_layers.{i}.conv.weight              ConvTranspose2d
  feature_network.out_layers.{i}.weight                       Conv2d bias-free
  match_feature_network.*                                     frozen copy
  volume.agg_mlp.{0,2}.{weight,bias}                           Linear
  reg_network.nets.{s}.conv{k}.net.0.kernel                    torchsparse conv
  reg_network.nets.{s}.conv{k}.net.1.{weight,bias,running_*}  BatchNorm
  reg_network.nets.{s}.out_lin.weight                          Linear bias-free
  implicit_surface.sdf_network.lin{l}.{weight_g,weight_v,bias} weight-norm
  implicit_surface.color_network.{...}.{weight,bias} + .s
  implicit_surface.deviation_network.variance

Layout mappings (validated by tests/test_layers.py golden tests vs torch):
  Linear  (out,in)            -> (in,out)                 transpose
  Conv2d  (out,in,kh,kw)      -> (kh,kw,in,out)
  ConvT2d (in,out,kh,kw)      -> (kh,kw,in,out)           + spatial flip
  weight-norm Linear: v (out,in) -> (in,out); g (out,1) -> (out,)
  torchsparse conv kernel (k^3, in, out) -> (k,k,k,in,out): tap t maps to
  spatial (t % k, (t//k) % k, t // k^2) — x varies fastest — per
  torchsparse 2.1.0's get_kernel_offsets (see _sparse_conv3d).
"""

from __future__ import annotations

import numpy as np


def _lin(sd, prefix):
    p = {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _lin_wn(sd, prefix):
    return {
        "v": np.ascontiguousarray(sd[f"{prefix}.weight_v"].T),
        "g": np.asarray(sd[f"{prefix}.weight_g"]).reshape(-1),
        "b": np.asarray(sd[f"{prefix}.bias"]),
    }


def _conv2d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])           # (out,in,kh,kw)
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _conv2d_T(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])           # (in,out,kh,kw)
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _sparse_conv3d(sd, prefix):
    """torchsparse kernel (k^3, in, out) -> (k, k, k, in, out), (x,y,z) axes.

    The tap enumeration is pinned by torchsparse 2.1.0 (the reference's
    requirements.txt pin), ``get_kernel_offsets`` in
    torchsparse/nn/utils/kernel.py: for ODD kernel volumes it builds
    ``offsets = [[x, y, z] for z in zs for y in ys for x in xs]`` — x varies
    FASTEST, so tap t corresponds to (ix, iy, iz) = (t % k, (t//k) % k,
    t // k^2).  Reshaping the (k^3, ...) kernel therefore yields axes
    (z, y, x, ...) and the (x, y, z) layout used by reg_net needs the
    spatial transpose below.  torchsparse applies in_coord = out_coord +
    offset (cross-correlation), matching reg_net's out[i] += w[off] x[i+off],
    so no spatial flip is involved.  All SuRF reg-net kernels are 3^3 (odd).
    Locked by tests/test_converter.py::test_sparse_conv3d_kernel_order.
    """
    key = f"{prefix}.kernel" if f"{prefix}.kernel" in sd else f"{prefix}.weight"
    w = np.asarray(sd[key])
    if w.ndim == 3:                                  # (k^3, in, out)
        k = round(w.shape[0] ** (1 / 3))
        assert k % 2 == 1, "even torchsparse kernels enumerate differently"
        w = w.reshape(k, k, k, w.shape[1], w.shape[2]).transpose(2, 1, 0, 3, 4)
    elif w.ndim == 5:                                # dense torch (out,in,k,k,k)
        w = w.transpose(2, 3, 4, 1, 0)
    return {"w": np.ascontiguousarray(w)}


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    state = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, state


def convert_feature_network(sd, prefix, num_stage):
    out = {"encoder": [], "decoder": [], "out": []}
    for i in range(num_stage):
        out["encoder"].append({
            "c0": _conv2d(sd, f"{prefix}.encoder_layers.{i}.0.conv"),
            "c1": _conv2d(sd, f"{prefix}.encoder_layers.{i}.1.conv"),
        })
        out["out"].append(_conv2d(sd, f"{prefix}.out_layers.{i}"))
        if i < num_stage - 1:
            out["decoder"].append(_conv2d_T(sd, f"{prefix}.decoder_layers.{i}.conv"))
    return out


def convert_feature_network_old(sd, prefix):
    """The unused 3-scale FPN variant (reference FeatureNetworkOld,
    feature_network.py:78-123) -> nn/feature_net.init_legacy layout."""
    def block(name):
        return _conv2d(sd, f"{prefix}.{name}.conv")

    return {
        "conv0": [block("conv0.0"), block("conv0.1")],
        "conv1": [block("conv1.0"), block("conv1.1"), block("conv1.2")],
        "conv2": [block("conv2.0"), block("conv2.1"), block("conv2.2")],
        "out2": _conv2d(sd, f"{prefix}.out2"),
        "out1": _conv2d(sd, f"{prefix}.out1"),
        "out0": _conv2d(sd, f"{prefix}.out0"),
        "inner1": _conv2d(sd, f"{prefix}.inner1"),
        "inner0": _conv2d(sd, f"{prefix}.inner0"),
    }


def convert_reg_network(sd, num_stages):
    names = ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6",
             "conv7", "conv9", "conv11"]
    params, state = [], []
    for s in range(num_stages):
        p, st = {}, {}
        for n in names:
            base = f"reg_network.nets.{s}.{n}.net"
            conv = _sparse_conv3d(sd, f"{base}.0")
            bn_p, bn_s = _bn(sd, f"{base}.1")
            p[n] = {"conv": conv, "bn": bn_p}
            st[n] = {"bn": bn_s}
        p["out_lin"] = {"w": np.ascontiguousarray(
            np.asarray(sd[f"reg_network.nets.{s}.out_lin.weight"]).T)}
        params.append(p)
        state.append(st)
    return params, state


def convert_sdf_network(sd, prefix, n_layers=7):
    layers = []
    for l in range(n_layers):
        layers.append(_lin_wn(sd, f"{prefix}.lin{l}"))
    return {"layers": layers}


def convert_blending_network(sd, prefix):
    def seq(name, n):
        return [_lin(sd, f"{prefix}.{name}.{i}") for i in n]
    p = {
        "ray_dir_fc": seq("ray_dir_fc", [0, 2]),
        "base_fc": seq("base_fc", [0, 2]),
        "vis_fc": seq("vis_fc", [0, 2]),
        "vis_fc2": seq("vis_fc2", [0, 2]),
        "rgb_fc": seq("rgb_fc", [0, 2, 4]),
    }
    if f"{prefix}.s" in sd:
        p["s"] = np.asarray(sd[f"{prefix}.s"])
    return p


def convert_checkpoint(state_dict, *, num_stage=4, sdf_layers=7):
    """state_dict: mapping name -> numpy array (pass torch tensors through
    ``{k: v.detach().cpu().numpy() for ...}``).  Returns (params, state)
    matching surf_tpu.nn.surf.init's pytree structure."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # strip DDP 'module.' prefixes
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    reg_p, reg_s = convert_reg_network(sd, num_stage)
    params = {
        "feature_network": convert_feature_network(sd, "feature_network", num_stage),
        "volume": {"agg_mlp": [_lin(sd, "volume.agg_mlp.0"),
                               _lin(sd, "volume.agg_mlp.2")]},
        "reg_network": reg_p,
        "implicit_surface": {
            "sdf_network": convert_sdf_network(
                sd, "implicit_surface.sdf_network", sdf_layers),
            "color_network": convert_blending_network(
                sd, "implicit_surface.color_network"),
            "deviation_network": {
                "variance": np.asarray(sd["implicit_surface.deviation_network.variance"])},
        },
    }
    state = {
        "reg_network": reg_s,
        "match_feature_network": convert_feature_network(
            sd, "match_feature_network", num_stage),
    }
    return params, state


def load_torch_checkpoint(path):
    """Load a reference .ckpt with torch (CPU) and return numpy state dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
