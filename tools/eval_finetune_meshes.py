"""Score finetune-exported meshes against the synthetic scene's analytic
ground truth.

`Runner.validate_finetune` exports `<exp>/meshes/<scene>_step<N>.ply` in
WORLD coordinates (scale_mat applied, mirroring the reference runner.py
mesh export).  This tool maps each mesh back to normalized space, applies
the protocol cleaning pass (mask-project + frustum ray-cast, the
reference's --clean_mesh / evaluation/clean_mesh.py), and reports the
truncated symmetric Chamfer vs the analytic sphere — the same metric
tools/train_synthetic.py tracks during training, so pre-finetune and
finetuned meshes are directly comparable.

Usage: python tools/eval_finetune_meshes.py <exp_dir> [--conf CONF]
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir", help="finetune base_exp_dir (contains meshes/)")
    ap.add_argument("--conf", default="confs/surf_synthetic_finetune.conf")
    args = ap.parse_args()

    from surf_tpu.config import ConfigFactory
    from surf_tpu.data.synthetic import SyntheticDataset
    from surf_tpu.geometry import Mesh
    from surf_tpu.geometry.clean_mesh import clean_mesh
    from train_synthetic import chamfer_vs_sphere

    conf = ConfigFactory.parse_file(args.conf)
    ds = SyntheticDataset(conf["finetune_dataset"], "val")
    scene = ds._build(0)
    scale_mat = np.asarray(scene["scale_mat"], np.float64)
    sm_inv_s = 1.0 / scale_mat[0, 0]

    paths = sorted(glob.glob(os.path.join(args.exp_dir, "meshes", "*.ply")),
                   key=lambda p: int(re.search(r"step(-?\d+)", p).group(1)))
    if not paths:
        sys.exit(f"no meshes under {args.exp_dir}/meshes")
    rows = []
    for p in paths:
        step = int(re.search(r"step(-?\d+)", p).group(1))
        m = Mesh.load(p)
        verts_norm = (np.asarray(m.vertices) - scale_mat[:3, 3]) * sm_inv_s
        cleaned = clean_mesh(Mesh(verts_norm, m.faces), scene["masks"],
                             scene["intrs"], scene["c2ws"])
        vc = np.asarray(cleaned.vertices, np.float32)
        if not len(vc):
            print(f"step {step:>6}: EMPTY after cleaning ({p})")
            continue
        d2s, s2d, ch = chamfer_vs_sphere(vc, scale_mat, ds.radius_world)
        rows.append((step, ch, d2s, s2d, len(vc)))
        print(f"step {step:>6}: chamfer={ch:.4f} (d2s={d2s:.4f} s2d={s2d:.4f})"
              f" verts={len(vc)}  {os.path.basename(p)}")
    if len(rows) > 1:
        first, last = rows[0], rows[-1]
        print(f"\nchamfer {first[1]:.4f} (step {first[0]}) -> "
              f"{last[1]:.4f} (step {last[0]})  "
              f"[{'IMPROVED' if last[1] < first[1] else 'regressed'}]")


if __name__ == "__main__":
    main()
