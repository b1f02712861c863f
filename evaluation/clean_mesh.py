"""Offline DTU mesh cleaning against the official DTU_TEST masks.

Re-implementation of the reference evaluation/clean_mesh.py:282-316 using
surf_tpu's native geometry stack (C++ BVH raycaster instead of pyembree):
for each of the 15 test scans, project vertices into the dilated official
1600x1200 masks of the capture views (set 0: view 23 list, set 1: view 43
list), keep faces visible in >= 1 mask, ray-cast from every view keeping
hit faces, drop connected components < 500 faces, and write
``final/scan{N}.ply`` for dtu_eval.py.
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from surf_tpu.geometry import Mesh                                   # noqa: E402
from surf_tpu.geometry.clean_mesh import (                           # noqa: E402
    dilate_masks, clean_mesh_by_mask, clean_mesh_outside_frustum)
from surf_tpu.data.cameras import read_cam_file                      # noqa: E402

SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]
VIEW_LIST_SET0 = [23, 24, 33, 22, 15, 34, 14, 32, 16, 35, 25]
VIEW_LIST_SET1 = [43, 42, 44, 33, 34, 32, 45, 23, 41, 24, 31]
MASK_HW = (1200, 1600)


def clean_points_by_mask_official(points, masks, projs, minimal_vis=1):
    """Vertex visibility with the OFFICIAL offline indexing (reference
    evaluation/clean_mesh.py:101-141): project with the full P matrix,
    ``round(+1)`` matlab-style indexing into masks padded with a ONES
    border — so points within one pixel outside the image count as visible —
    and threshold ``inside_mask > minimal_vis`` (>=2 views at the default).

    This differs from the runtime pass (surf_tpu/geometry/clean_mesh.py):
    bilinear mask sampling there, nearest+border-ones here.
    """
    h, w = masks.shape[1:]
    inside = np.zeros(len(points), np.float32)
    for i in range(len(projs)):
        P = projs[i]
        pi = points @ P[:3, :3].T + P[:3, 3]
        pi = pi / pi[:, 2:]
        pim = np.round(pi).astype(np.int64) + 1
        m = masks[i] > 0
        m = np.concatenate([np.ones((1, w), bool), m, np.ones((1, w), bool)], 0)
        m = np.concatenate(
            [np.ones((h + 2, 1), bool), m, np.ones((h + 2, 1), bool)], 1)
        in_img = ((pim[:, 0] >= 0) & (pim[:, 0] <= w)
                  & (pim[:, 1] >= 0) & (pim[:, 1] <= h))
        cur = m[pim[:, 1].clip(0, h + 1), pim[:, 0].clip(0, w + 1)]
        inside += cur.astype(np.float32) * in_img
    return inside > minimal_vis


def clean_mesh_by_mask_official(mesh, masks, intrs, c2ws, minimal_vis=1):
    projs = [intrs[i][:3, :3] @ np.linalg.inv(c2ws[i])[:3, :4]
             for i in range(len(intrs))]
    keep = clean_points_by_mask_official(mesh.vertices, masks, projs,
                                         minimal_vis)
    mesh.update_faces(keep[mesh.faces].all(axis=-1))
    mesh.remove_unreferenced_vertices()
    return mesh


def load_views(root_dir, scan, view_ids):
    masks, intrs, c2ws = [], [], []
    for vid in view_ids:
        mask_path = os.path.join(root_dir, f"scan{scan}", "mask", f"{vid:03d}.png")
        mask = np.array(Image.open(mask_path).convert("L"), np.float32) > 127
        cam_path = os.path.join(root_dir, f"scan{scan}", "cams",
                                f"{vid:08d}_cam.txt")
        if not os.path.exists(cam_path):
            cam_path = os.path.join(root_dir, "Cameras", f"{vid:08d}_cam.txt")
        intr, w2c, _ = read_cam_file(cam_path, MASK_HW, 192, native_hw=MASK_HW)
        masks.append(mask.astype(np.float32))
        intrs.append(intr)
        c2ws.append(np.linalg.inv(w2c))
    return np.stack(masks), np.stack(intrs), np.stack(c2ws)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, default="./data/DTU_TEST")
    parser.add_argument("--out_dir", type=str, default="./outputs/mesh")
    parser.add_argument("--n_view", type=int, default=3)
    parser.add_argument("--set", type=int, default=1)
    parser.add_argument("--mask_kernel_size", type=int, default=11)
    args = parser.parse_args()

    view_list = VIEW_LIST_SET0 if args.set == 0 else VIEW_LIST_SET1
    imgs_idx = view_list[: args.n_view]
    os.makedirs(os.path.join(args.out_dir, "final"), exist_ok=True)

    for scan in SCANS:
        print(f"processing scan{scan}")
        candidates = glob(os.path.join(args.out_dir, f"*scan{scan}_epoch0.ply")) or \
            glob(os.path.join(args.out_dir, f"*scan{scan}_*.ply"))
        if not candidates:
            print(f"  no mesh for scan{scan}, skipping")
            continue
        mesh = Mesh.load(candidates[0])
        masks, intrs, c2ws = load_views(args.root_dir, scan, imgs_idx)
        masks = dilate_masks(masks, args.mask_kernel_size // 2)
        mesh = clean_mesh_by_mask_official(mesh, masks, intrs, c2ws,
                                           minimal_vis=1)
        mesh = clean_mesh_outside_frustum(mesh, masks, intrs, c2ws, min_cc=500)
        out = os.path.join(args.out_dir, "final", f"scan{scan}.ply")
        mesh.export(out)
        print(f"  -> {out} ({len(mesh.faces)} faces)")


if __name__ == "__main__":
    main()
