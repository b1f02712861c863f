"""Per-scene finetuning dataset for DTU (host numpy).

Functional re-design of datasets/dtu_finetune.py:75-345: a fixed 3-view set
(ref + top-2 pair sources), cameras/scale computed once, cached images /
masks / pseudo depths / pseudo points; ``get_all_images`` feeds the one-off
volume initialization, ``get_random_rays(vid)`` yields 512 uniform random
rays of a rotating reference view (with view_ids rotated so ``vid`` is the
reference), ``get_rays_at(vid)`` a full validation grid.

A synthetic variant (``SyntheticDatasetFinetune``) exposes the same surface
from the procedural scene so the finetune path runs without DTU data.
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from ..io.pfm import read_pfm
from ..io.ply import read_ply
from .cameras import (read_cam_file, load_K_Rt_from_P, get_scale_mat,
                      rays_from_pixels, near_far_from_campos)


class _FinetuneBase:
    """Shared ray/packaging logic over cached per-view tensors."""

    # subclasses set: img_hw, n_rays, num_views, val_res_level, images (nv,h,w,3),
    # masks (nv,h,w), intrs (nv,4,4), c2ws (nv,4,4), near_fars (nv,2),
    # pseudo_depths (nv,h,w), pseudo_pts (n,3), scale_mat, scene

    def _rays(self, vid, px, py):
        rays_o, rays_d = rays_from_pixels(px, py, self.intrs[vid], self.c2ws[vid])
        near = np.array([[self.near_fars[vid][0]]], np.float32)
        far = np.array([[self.near_fars[vid][1]]], np.float32)
        return rays_o.astype(np.float32), rays_d.astype(np.float32), near, far

    def _view_order(self, vid):
        return [vid] + [v for v in range(self.num_views) if v != vid]

    def get_all_images(self):
        return {
            "imgs": self.images,
            "c2ws": self.c2ws,
            "intrs": self.intrs,
            "near": np.array([[self.near_fars[0][0]]], np.float32),
            "far": np.array([[self.near_fars[0][1]]], np.float32),
            "near_fars": self.near_fars,
        }

    def get_random_rays(self, vid, rng=None):
        vid = int(vid)
        rng = rng or np.random
        h, w = self.img_hw
        px = rng.randint(0, w, self.n_rays).astype(np.float32)
        py = rng.randint(0, h, self.n_rays).astype(np.float32)
        pyi, pxi = py.astype(np.int64), px.astype(np.int64)
        rays_o, rays_d, near, far = self._rays(vid, px, py)
        order = self._view_order(vid)
        sel = rng.randint(0, len(self.pseudo_pts), 2048)
        return {
            "rays_o": rays_o, "rays_d": rays_d, "near": near, "far": far,
            "color": self.images[vid][pyi, pxi],
            "intrs": self.intrs[order], "c2ws": self.c2ws[order],
            "view_ids": np.asarray(order, np.int64),
            "imgs": self.images[order],
            "near_fars": self.near_fars[order],
            "pseudo_pts": self.pseudo_pts[sel].astype(np.float32),
            "pseudo_depth": self.pseudo_depths[vid][pyi, pxi],
            "mask": np.ones(self.n_rays, np.float32),
        }

    def get_rays_at(self, vid):
        vid = int(vid)
        h, w = self.img_hw
        lvl = self.val_res_level
        tx = np.linspace(0, w - 1, w // lvl, dtype=np.float32)
        ty = np.linspace(0, h - 1, h // lvl, dtype=np.float32)
        gx, gy = np.meshgrid(tx, ty, indexing="xy")
        px, py = gx.reshape(-1), gy.reshape(-1)
        pyi, pxi = py.astype(np.int64), px.astype(np.int64)
        rays_o, rays_d, near, far = self._rays(vid, px, py)
        order = self._view_order(vid)
        return {
            "rays_o": rays_o, "rays_d": rays_d, "near": near, "far": far,
            "color": self.images[vid][pyi, pxi],
            "intrs": self.intrs[order], "c2ws": self.c2ws[order],
            "view_ids": np.asarray(order, np.int64),
            "scale_mat": self.scale_mat,
            "scene": self.scene,
            "imgs": self.images[order],
            "masks": self.masks[order],
            "near_fars": self.near_fars[order],
            "bound_min": np.array([-1, -1, -1], np.float32),
            "bound_max": np.array([1, 1, 1], np.float32),
            "hw": np.array([h // lvl, w // lvl], np.int32),
            "file_name": f"{self.scene}_view{vid}",
            "depth_ref": self.pseudo_depths[vid],
        }


class DTUDatasetFinetune(_FinetuneBase):
    def __init__(self, confs, mode="finetune"):
        self.mode = mode
        self.data_dir = confs["data_dir"]
        self.interval_scale = confs.get_float("interval_scale")
        self.num_interval = confs.get_int("num_interval")
        self.img_hw = tuple(confs.get_list("img_hw"))
        self.n_rays = confs.get_int("n_rays")
        self.factor = confs.get_float("factor")
        self.num_views = 3
        self.scene = confs.get_string("scene")
        self.ref_view = int(confs.get_int("ref_view"))
        self.val_res_level = confs.get_int("val_res_level", default=1)

        pairs = self._read_pairs()
        self.all_views = [self.ref_view] + list(pairs[self.ref_view])[:self.num_views - 1]
        print("finetune views:", self.all_views)

        intrs, w2cs, near_fars = [], [], []
        for vid in self.all_views:
            intr, w2c, nf = read_cam_file(
                os.path.join(self.data_dir, f"Cameras/{vid:0>8}_cam.txt"),
                self.img_hw, self.num_interval, self.interval_scale)
            intrs.append(intr)
            w2cs.append(w2c)
            near_fars.append(nf)
        w2c_ref = w2cs[0]
        w2c_ref_inv = np.linalg.inv(w2c_ref)
        w2cs = [w2c @ w2c_ref_inv for w2c in w2cs]
        scale_mat, self.scale_factor = get_scale_mat(
            self.img_hw, intrs, w2cs, near_fars, factor=self.factor)
        c2ws, new_intrs, new_nf = [], [], []
        for intr, w2c in zip(intrs, w2cs):
            P = (intr @ w2c @ scale_mat)[:3, :4]
            ni, c2w = load_K_Rt_from_P(P)
            c2ws.append(c2w)
            new_intrs.append(ni)
            new_nf.append(near_far_from_campos(c2w))
        self.intrs = np.stack(new_intrs).astype(np.float32)
        self.c2ws = np.stack(c2ws).astype(np.float32)
        self.near_fars = np.stack(new_nf).astype(np.float32)

        def load_img(path):
            img = np.array(Image.open(path), dtype=np.float32)
            return cv2.resize(img, self.img_hw[::-1], interpolation=cv2.INTER_NEAREST)

        self.images = np.stack([
            load_img(os.path.join(
                self.data_dir,
                f"Rectified_raw/{self.scene}/rect_{vid + 1:0>3}_3_r5000.png")) / 256.0
            for vid in self.all_views]).astype(np.float32)
        self.masks = np.stack([
            (load_img(os.path.join(
                self.data_dir,
                f"Depths_raw/{self.scene}/depth_visual_{vid:0>4}.png")) > 10)
            for vid in self.all_views]).astype(np.float32)
        self.pseudo_depths = np.stack([
            cv2.resize(read_pfm(os.path.join(
                self.data_dir,
                f"PseudoMVSScore/dtu_exp/{self.scene}/filtered_avg_depth/{vid:0>8}.pfm"))[0],
                self.img_hw[::-1], interpolation=cv2.INTER_NEAREST)
            for vid in self.all_views]).astype(np.float32) * self.scale_factor

        ply = read_ply(os.path.join(
            self.data_dir, f"PseudoMVSDepth/mvsnet{int(self.scene[4:]):0>3}_l3.ply"))
        pw = ply["vertices"].astype(np.float32)
        pw = (w2c_ref @ np.concatenate([pw, np.ones_like(pw[:, :1])], 1).T).T[:, :3]
        self.pseudo_pts = (pw - scale_mat[:3, 3]) / scale_mat[0, 0]
        self.scale_mat = (w2c_ref_inv @ scale_mat).astype(np.float32)

    def _read_pairs(self, num_select=10):
        pairs = [None] * 49
        with open(os.path.join(self.data_dir, "Cameras/pair.txt")) as f:
            n = int(f.readline())
            for _ in range(n):
                ref = int(f.readline().rstrip())
                srcs = [int(x) for x in f.readline().rstrip().split()[1::2]]
                pairs[ref] = srcs[:num_select]
        return pairs


class DTUDatasetFinetuneNeuS(_FinetuneBase):
    """Finetune variant using NeuS-preprocessed DTU (cameras_sphere.npz with
    world_mat_i/scale_mat_i, image/{vid:06d}.png + mask/{vid:03d}.png) —
    reference: datasets/dtu_finetune_neus.py:75-140."""

    def __init__(self, confs, mode="finetune"):
        self.mode = mode
        self.data_dir = confs["data_dir"]
        self.img_hw = tuple(confs.get_list("img_hw"))
        self.n_rays = confs.get_int("n_rays")
        self.num_views = 3
        self.scene = confs.get_string("scene")
        self.ref_view = int(confs.get_int("ref_view"))
        self.val_res_level = confs.get_int("val_res_level", default=1)

        pairs = DTUDatasetFinetune._read_pairs(self)
        self.all_views = [self.ref_view] + list(pairs[self.ref_view])[:self.num_views - 1]

        cams = np.load(os.path.join(
            self.data_dir, f"neus_data/data_DTU/dtu_{self.scene}/cameras_sphere.npz"))
        intrs, c2ws, nfs = [], [], []
        for vid in self.all_views:
            P = (cams[f"world_mat_{vid}"] @ cams[f"scale_mat_{vid}"])[:3, :4]
            ni, c2w = load_K_Rt_from_P(P)
            intrs.append(ni)
            c2ws.append(c2w)
            nfs.append(near_far_from_campos(c2w))
        self.intrs = np.stack(intrs).astype(np.float32)
        self.c2ws = np.stack(c2ws).astype(np.float32)
        self.near_fars = np.stack(nfs).astype(np.float32)
        self.scale_mat = cams[f"scale_mat_{self.all_views[0]}"].astype(np.float32)
        self.scale_factor = 1.0 / self.scale_mat[0, 0]

        def load_img(path):
            img = np.array(Image.open(path), dtype=np.float32)
            return cv2.resize(img, self.img_hw[::-1], interpolation=cv2.INTER_NEAREST)

        base = os.path.join(self.data_dir, f"neus_data/data_DTU/dtu_{self.scene}")
        self.images = np.stack([
            load_img(os.path.join(base, f"image/{vid:0>6}.png")) / 256.0
            for vid in self.all_views]).astype(np.float32)
        self.masks = np.stack([
            (load_img(os.path.join(base, f"mask/{vid:0>3}.png")) > 10)[..., 0]
            if load_img(os.path.join(base, f"mask/{vid:0>3}.png")).ndim == 3
            else (load_img(os.path.join(base, f"mask/{vid:0>3}.png")) > 10)
            for vid in self.all_views]).astype(np.float32)
        self.pseudo_depths = np.stack([
            cv2.resize(read_pfm(os.path.join(
                self.data_dir,
                f"PseudoMVSScore/dtu_exp/{self.scene}/filtered_avg_depth/{vid:0>8}.pfm"))[0],
                self.img_hw[::-1], interpolation=cv2.INTER_NEAREST)
            for vid in self.all_views]).astype(np.float32) * self.scale_factor
        ply = read_ply(os.path.join(
            self.data_dir, f"PseudoMVSDepth/mvsnet{int(self.scene[4:]):0>3}_l3.ply"))
        pw = ply["vertices"].astype(np.float32)
        self.pseudo_pts = ((pw - self.scale_mat[:3, 3]) / self.scale_mat[0, 0]).astype(np.float32)


class SyntheticDatasetFinetune(_FinetuneBase):
    """Finetune surface over the procedural synthetic scene (tests/bench)."""

    def __init__(self, confs, mode="finetune"):
        from .synthetic import SyntheticDataset
        base = SyntheticDataset(confs, "val")
        s = base._build(0)
        self.img_hw = base.img_hw
        self.n_rays = confs.get_int("n_rays", default=512)
        self.num_views = s["imgs"].shape[0]
        self.val_res_level = confs.get_int("val_res_level", default=1)
        self.scene = s["scan"]
        self.images = s["imgs"]
        self.masks = s["masks"]
        self.intrs = s["intrs"]
        self.c2ws = s["c2ws"]
        self.near_fars = s["near_fars"]
        self.pseudo_depths = np.stack(s["depths"]).astype(np.float32)
        self.scale_mat = s["scale_mat"]
        rng = np.random.RandomState(0)
        sph = rng.randn(8192, 3)
        sph = sph / np.linalg.norm(sph, axis=1, keepdims=True) * base.radius_world
        pw = (s["w2c_ref"] @ np.concatenate([sph, np.ones((8192, 1))], 1).T).T[:, :3]
        sm = s["scale_mat_raw"]
        self.pseudo_pts = ((pw - sm[:3, 3]) / sm[0, 0]).astype(np.float32)
