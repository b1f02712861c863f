"""Runtime mesh cleaning against object masks and capture frusta.

Functional re-design of the reference's utils/clean_mesh.py:9-130:
  * ``clean_mesh_by_mask``: project vertices into dilated per-view masks,
    keep faces whose vertices land in > min_nb_visible masks;
  * ``clean_mesh_outside_frustum``: ray-cast from every view (BVH raycaster,
    csrc/raycast_bvh.cpp), keep hit faces, then drop connected components
    smaller than ``min_cc`` faces.
All host-side numpy/C++.
"""

from __future__ import annotations

import cv2
import numpy as np

from .mesh import Mesh
from .raycast import RayMeshIntersector


def dilate_masks(masks, radius=11):
    """Binary dilation with a disk structuring element (reference uses
    skimage.morphology.disk(11); cv2 ellipse kernel is equivalent here)."""
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
    return np.stack([cv2.dilate((m > 0).astype(np.uint8), k) for m in masks])


def clean_mesh_by_mask(mesh, masks, intrs, c2ws, min_nb_visible=1):
    """masks: (nv, h, w) binary; intrs/c2ws (nv, 4, 4)."""
    pts = mesh.vertices  # (n, 3)
    nv, h, w = masks.shape
    visible = np.zeros(len(pts), np.int32)
    for v in range(nv):
        w2c = np.linalg.inv(c2ws[v])
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        proj = cam @ intrs[v][:3, :3].T
        z = proj[:, 2]
        xy = proj[:, :2] / np.clip(z[:, None], 1e-8, None)
        nx = 2 * xy[:, 0] / (w - 1) - 1
        ny = 2 * xy[:, 1] / (h - 1) - 1
        inside = (np.abs(nx) <= 1) & (np.abs(ny) <= 1) & (z > 1e-8)
        xi = np.clip(np.round(xy[:, 0]).astype(np.int64), 0, w - 1)
        yi = np.clip(np.round(xy[:, 1]).astype(np.int64), 0, h - 1)
        visible += (masks[v][yi, xi] > 0) & inside
    keep_vert = visible > min_nb_visible
    face_mask = keep_vert[mesh.faces].all(axis=-1)
    mesh.update_faces(face_mask)
    return mesh


def clean_mesh_outside_frustum(mesh, masks, intrs, c2ws, upscale=4, min_cc=500,
                               chunk=1 << 16):
    """Keep faces hit by at least one camera ray; then keep connected
    components with >= min_cc faces (utils/clean_mesh.py:38-106)."""
    if len(mesh.faces) == 0:
        return mesh
    intersector = RayMeshIntersector(mesh)
    nv, h, w = masks.shape
    hit = np.zeros(len(mesh.faces), bool)
    for v in range(nv):
        ys, xs = np.meshgrid(np.linspace(0, h - 1, int(h * upscale), dtype=np.float32),
                             np.linspace(0, w - 1, int(w * upscale), dtype=np.float32),
                             indexing="ij")
        p = np.stack([xs.reshape(-1), ys.reshape(-1), np.ones(xs.size, np.float32)], -1)
        dirs = p @ np.linalg.inv(intrs[v][:3, :3]).T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = dirs @ c2ws[v][:3, :3].T
        origin = np.broadcast_to(c2ws[v][:3, 3], dirs.shape)
        for s in range(0, len(dirs), chunk):
            tri, _ = intersector.intersects_first(origin[s:s + chunk], dirs[s:s + chunk])
            tri = tri[tri >= 0]
            hit[tri] = True
    mesh.update_faces(hit)
    if len(mesh.faces):
        labels, n = mesh.face_adjacency_components()
        sizes = np.bincount(labels, minlength=n)
        mesh.update_faces(sizes[labels] >= min_cc)
    mesh.remove_unreferenced_vertices()
    return mesh


def clean_mesh(mesh, masks, intrs, c2ws, dilate_radius=11, min_cc=500):
    """The inline ``--clean_mesh`` pass (utils/clean_mesh.py:109-130)."""
    masks = dilate_masks(np.asarray(masks), dilate_radius)
    mesh = clean_mesh_by_mask(mesh, masks, np.asarray(intrs), np.asarray(c2ws))
    mesh = clean_mesh_outside_frustum(mesh, masks, np.asarray(intrs),
                                      np.asarray(c2ws), min_cc=min_cc)
    return mesh
