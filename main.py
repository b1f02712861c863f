"""CLI entry point — same public flag surface as the reference main.py:4-23
(minus torch-distributed plumbing; multi-chip parallelism is configured via
the jax mesh, see surf_tpu/parallel)."""

import argparse

from surf_tpu.runner import Runner


def parse_args():
    parser = argparse.ArgumentParser(description="surf_tpu")
    parser.add_argument("--conf", type=str, default="./confs/surf.conf",
                        help="config file path")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "val", "finetune"])
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path to resume")
    parser.add_argument("--mesh_resolution", type=int, default=512)
    parser.add_argument("--clean_mesh", action="store_true",
                        help="clean mesh during validation")
    parser.add_argument("--scene", type=str, default=None,
                        help="finetune scene override")
    parser.add_argument("--ref_view", type=int, default=None,
                        help="finetune reference view override")
    parser.add_argument("--load_vol", action="store_true",
                        help="resume from a volume-only finetune checkpoint")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    Runner(args).run()
