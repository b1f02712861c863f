"""CPU shims that make the reference torch stack importable in this image.

The reference depends on two CUDA-only components that cannot be installed
here: torchsparse 2.1.0 (sparse conv3d, reg_network.py:2) and the
gridsample_grad2 cpp_extension (cuda_gridsample.py:5).  For composite
forward-parity testing (VERDICT r3 #3) we need the torch reference
`SuRF.forward` to run end-to-end on CPU, so this module registers
work-alike stand-ins in sys.modules BEFORE the reference modules import:

  * ``torchsparse`` — SparseTensor + spnn.{Conv3d, BatchNorm, ReLU}
    implemented with coordinate hashing + per-tap matmuls in pure torch.
    Geometry follows the torchsparse conventions the converter pins
    (convert/torch_converter.py::_sparse_conv3d): x-fastest tap
    enumeration, cross-correlation (in = out + offset), stride-2 output
    set = unique(coords // 2), transposed convs restoring the exact
    pre-downsample coordinate list (order included).  Parameter is named
    ``kernel`` with torchsparse's (k^3, in, out) shape so state_dicts are
    key- and layout-compatible with real checkpoints.
  * ``cuda_gridsample`` — modern torch's F.grid_sample IS twice
    differentiable on CPU (verified), so grid_sample_2d/3d are wrappers.
  * ``mcubes`` — backed by surf_tpu's own C++ marching cubes.

These shims are TEST infrastructure: they let the parity suite compare the
jax composite against the reference wiring without CUDA.  They are not
part of the surf_tpu runtime.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn


# ---------------------------------------------------------------------------
# torchsparse
# ---------------------------------------------------------------------------

# x varies fastest — torchsparse 2.1.0 get_kernel_offsets for odd kernels
_OFFSETS = [(x, y, z) for z in (-1, 0, 1) for y in (-1, 0, 1)
            for x in (-1, 0, 1)]


class SparseTensor:
    """Minimal torchsparse.tensor.SparseTensor: .F features (N, C) and .C
    coords (N, 4) int [batch, x, y, z].  ``cmaps`` carries the per-level
    coordinate lists so transposed convs restore the exact pre-downsample
    rows (what torchsparse's cached kmaps do)."""

    def __init__(self, feats, coords, level=0, cmaps=None):
        self.F = feats
        self.C = coords
        self.level = level
        self.cmaps = {level: coords} if cmaps is None else cmaps
        self.cmaps[level] = coords

    def __add__(self, other):
        assert self.F.shape == other.F.shape
        return SparseTensor(self.F + other.F, self.C, self.level, self.cmaps)


def _coord_hash(coords):
    return {tuple(c): i for i, c in enumerate(coords.tolist())}


class Conv3d(nn.Module):
    def __init__(self, inc, outc, kernel_size=3, dilation=1, stride=1,
                 transposed=False, bias=False):
        super().__init__()
        assert kernel_size == 3 and dilation == 1 and stride in (1, 2)
        assert not bias
        self.inc, self.outc = inc, outc
        self.stride = stride
        self.transposed = transposed
        self.kernel = nn.Parameter(
            torch.randn(kernel_size ** 3, inc, outc) / np.sqrt(27 * inc))

    def forward(self, x: SparseTensor) -> SparseTensor:
        feats, coords = x.F, x.C
        h_in = _coord_hash(coords)
        if self.transposed:
            # output = cached pre-downsample coords of the matching level;
            # out[p] = sum_d W[tap(d)] @ in[(p - d) / 2] over integral,
            # active (p - d) / 2 — exact transpose geometry of the
            # stride-2 down conv below
            assert self.stride == 2
            out_coords = x.cmaps[x.level - 1]
            out = feats.new_zeros(out_coords.shape[0], self.outc)
            oc = out_coords.tolist()
            for t, (dx, dy, dz) in enumerate(_OFFSETS):
                rows_in, rows_out = [], []
                for i, (b, px, py, pz) in enumerate(oc):
                    qx, qy, qz = px - dx, py - dy, pz - dz
                    if qx % 2 or qy % 2 or qz % 2:
                        continue
                    j = h_in.get((b, qx // 2, qy // 2, qz // 2))
                    if j is not None:
                        rows_in.append(j)
                        rows_out.append(i)
                if rows_in:
                    out[rows_out] += feats[rows_in] @ self.kernel[t]
            return SparseTensor(out, out_coords, x.level - 1, x.cmaps)

        if self.stride == 1:
            # submanifold: out coords = in coords; in = out + offset
            out = feats.new_zeros(coords.shape[0], self.outc)
            cl = coords.tolist()
            for t, (dx, dy, dz) in enumerate(_OFFSETS):
                rows_in, rows_out = [], []
                for i, (b, px, py, pz) in enumerate(cl):
                    j = h_in.get((b, px + dx, py + dy, pz + dz))
                    if j is not None:
                        rows_in.append(j)
                        rows_out.append(i)
                if rows_in:
                    out[rows_out] += feats[rows_in] @ self.kernel[t]
            return SparseTensor(out, coords, x.level, x.cmaps)

        # stride-2 downsample: out set = unique(c // 2) (halved lattice),
        # out[q] = sum_d W[tap(d)] @ in[2q + d]
        down = coords.clone()
        down[:, 1:] = torch.div(down[:, 1:], 2, rounding_mode="floor")
        out_coords = torch.unique(down, dim=0)
        out = feats.new_zeros(out_coords.shape[0], self.outc)
        oc = out_coords.tolist()
        for t, (dx, dy, dz) in enumerate(_OFFSETS):
            rows_in, rows_out = [], []
            for i, (b, qx, qy, qz) in enumerate(oc):
                j = h_in.get((b, 2 * qx + dx, 2 * qy + dy, 2 * qz + dz))
                if j is not None:
                    rows_in.append(j)
                    rows_out.append(i)
            if rows_in:
                out[rows_out] += feats[rows_in] @ self.kernel[t]
        return SparseTensor(out, out_coords, x.level + 1, x.cmaps)


class BatchNorm(nn.BatchNorm1d):
    """spnn.BatchNorm: BatchNorm1d over the (N, C) sparse features."""

    def forward(self, x: SparseTensor) -> SparseTensor:
        return SparseTensor(super().forward(x.F), x.C, x.level, x.cmaps)


class ReLU(nn.ReLU):
    def forward(self, x: SparseTensor) -> SparseTensor:
        return SparseTensor(super().forward(x.F), x.C, x.level, x.cmaps)


# ---------------------------------------------------------------------------
# cuda_gridsample (gridsample_grad2): modern torch grid_sample is twice
# differentiable on CPU, so the wrappers preserve the reference API
# (cuda_gridsample.py:7-14) exactly.
# ---------------------------------------------------------------------------

def grid_sample_2d(input, grid, padding_mode="zeros", align_corners=True):
    assert padding_mode in ("zeros", "border")
    return torch.nn.functional.grid_sample(
        input, grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners)


def grid_sample_3d(input, grid, padding_mode="zeros", align_corners=True):
    assert padding_mode in ("zeros", "border")
    return torch.nn.functional.grid_sample(
        input, grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners)


# ---------------------------------------------------------------------------
# mcubes — backed by surf_tpu's C++ marching cubes
# ---------------------------------------------------------------------------

def _mcubes_marching_cubes(u, threshold):
    from surf_tpu.geometry import marching_cubes as _mc
    verts, tris = _mc(np.asarray(u, np.float32), float(threshold))
    return verts, tris


def install():
    """Register the shims in sys.modules (idempotent).  Must run before the
    first import of the reference ``models`` package."""
    if "torchsparse" in sys.modules and not hasattr(
            sys.modules["torchsparse"], "__surf_tpu_shim__"):
        raise RuntimeError("real torchsparse already imported")

    ts = types.ModuleType("torchsparse")
    ts.__surf_tpu_shim__ = True
    ts_tensor = types.ModuleType("torchsparse.tensor")
    ts_tensor.SparseTensor = SparseTensor
    ts_nn = types.ModuleType("torchsparse.nn")
    ts_nn.Conv3d = Conv3d
    ts_nn.BatchNorm = BatchNorm
    ts_nn.ReLU = ReLU
    ts.tensor = ts_tensor
    ts.nn = ts_nn
    ts.SparseTensor = SparseTensor
    sys.modules["torchsparse"] = ts
    sys.modules["torchsparse.tensor"] = ts_tensor
    sys.modules["torchsparse.nn"] = ts_nn

    cug = types.ModuleType("models.modules.grid_sample_cuda.cuda_gridsample")
    cug.grid_sample_2d = grid_sample_2d
    cug.grid_sample_3d = grid_sample_3d
    pkg = types.ModuleType("models.modules.grid_sample_cuda")
    pkg.__path__ = []
    pkg.cuda_gridsample = cug
    sys.modules["models.modules.grid_sample_cuda"] = pkg
    sys.modules["models.modules.grid_sample_cuda.cuda_gridsample"] = cug

    mc = types.ModuleType("mcubes")
    mc.marching_cubes = _mcubes_marching_cubes
    sys.modules["mcubes"] = mc

    # implicit_surface.py:189 hard-codes .cuda() in the zero-crossing index
    # helper; route it to a no-op on CPU-only hosts
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
