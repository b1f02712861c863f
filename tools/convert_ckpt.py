"""CLI: convert a reference (PyTorch) SuRF checkpoint into a surf_tpu
checkpoint.

    python tools/convert_ckpt.py --src model_000015.ckpt --dst converted.npz

The output npz loads via `main.py --resume converted.npz` for val/finetune.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from surf_tpu.convert.torch_converter import convert_checkpoint, load_torch_checkpoint
from surf_tpu.utils.checkpoint import save_checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True, help="torch .ckpt")
    parser.add_argument("--dst", type=str, required=True, help="output .npz")
    parser.add_argument("--num_stage", type=int, default=4)
    parser.add_argument("--sdf_layers", type=int, default=7)
    args = parser.parse_args()

    sd = load_torch_checkpoint(args.src)
    print(f"loaded {len(sd)} tensors from {args.src}")
    # torchsparse kernel tap order is fixed (torchsparse 2.1.0
    # get_kernel_offsets; see convert/torch_converter._sparse_conv3d)
    params, state = convert_checkpoint(
        sd, num_stage=args.num_stage, sdf_layers=args.sdf_layers)
    tree = {"epoch": -1, "model": params, "state": state}
    save_checkpoint(args.dst, tree)
    n_params = sum(np.asarray(x).size for x in
                   __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.dst} ({n_params:,} parameters)")


if __name__ == "__main__":
    main()
