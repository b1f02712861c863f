"""Exercise the real dataset loaders against miniature on-disk fixtures that
mimic the DTU / BlendedMVS directory layouts."""

import os

import numpy as np
import pytest
from PIL import Image

from surf_tpu.config import ConfigFactory
from surf_tpu.io.pfm import write_pfm
from surf_tpu.io.ply import write_ply

H, W = 48, 64


def write_cam(path, vid):
    ang = vid * 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0],
                  [0, 0, 1]], np.float32)
    t = np.array([0.1 * vid, 0.05 * vid, 4.0 + 0.1 * vid], np.float32)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, :3] = R
    extr[:3, 3] = t
    intr = np.array([[800.0, 0, 800], [0, 800, 600], [0, 0, 1]], np.float32)
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in extr:
            f.write(" ".join(str(x) for x in row) + "\n")
        f.write("\nintrinsic\n")
        for row in intr:
            f.write(" ".join(str(x) for x in row) + "\n")
        f.write("\n2.5 0.01\n")


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    scan = "scan24"
    os.makedirs(root / "Cameras", exist_ok=True)
    os.makedirs(root / f"Rectified_raw/{scan}", exist_ok=True)
    os.makedirs(root / f"Depths_raw/{scan}", exist_ok=True)
    os.makedirs(root / f"Pseudo_depths/{scan}", exist_ok=True)
    os.makedirs(root / "Pseudo_points", exist_ok=True)

    with open(root / "Cameras/pair.txt", "w") as f:
        f.write("5\n")
        for ref in range(5):
            srcs = [v for v in range(5) if v != ref][:4]
            f.write(f"{ref}\n{len(srcs)} " +
                    " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) + "\n")

    rng = np.random.RandomState(0)
    for vid in range(5):
        write_cam(root / f"Cameras/{vid:08d}_cam.txt", vid)
        img = (rng.rand(H * 4, W * 4, 3) * 255).astype(np.uint8)
        for light in range(7):
            Image.fromarray(img).save(
                root / f"Rectified_raw/{scan}/rect_{vid + 1:0>3}_{light}_r5000.png")
        depth = rng.rand(H, W).astype(np.float32) * 2 + 2.5
        write_pfm(str(root / f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm"), depth)
        write_pfm(str(root / f"Pseudo_depths/{scan}/{vid:0>8}.pfm"), depth)
        mask = (rng.rand(H * 4, W * 4) > 0.3).astype(np.uint8) * 255
        Image.fromarray(mask).save(
            root / f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png")
    pts = rng.randn(500, 3).astype(np.float32)
    write_ply(str(root / "Pseudo_points/mvsnet024_l3.ply"), pts)
    return str(root)


def test_dtu_dataset_train(dtu_root):
    from surf_tpu.data.dtu import DTUDataset
    conf = ConfigFactory.parse_string(f"""
    d {{
        data_dir = {dtu_root}
        scene = [scan24]
        ref_view = [0, 1, 2, 3, 4]
        num_src_view = 2
        light_idx = [3]
        factor = 1.0
        interval_scale = 1
        num_interval = 192
        img_hw = [{H}, {W}]
        n_rays = 64
    }}""")["d"]
    ds = DTUDataset(conf, "train")
    assert len(ds) == 5  # 5 ref views x 1 light
    item = ds[0]
    assert item["imgs"].shape == (3, H, W, 3)
    assert item["rays_o"].shape == (64, 3)
    assert item["pseudo_pts"].shape == (2048, 3)
    assert item["intrs"].shape == (3, 4, 4)
    # normalized frame is well-formed (fixture cameras are nearly coincident
    # so the exact unit-sphere margin is not meaningful here)
    c = item["c2ws"][:, :3, 3]
    assert np.all(np.isfinite(c)) and np.all(np.linalg.norm(c, axis=1) > 0)
    assert np.isfinite(item["depth"]).all()
    nf = item["near_fars"]
    assert np.all(nf[:, 1] > nf[:, 0])


def test_dtu_dataset_val(dtu_root):
    from surf_tpu.data.dtu import DTUDataset
    conf = ConfigFactory.parse_string(f"""
    d {{
        data_dir = {dtu_root}
        scene = [scan24]
        ref_view = [1]
        light_idx = [3]
        num_src_view = 2
        val_res_level = 2
        factor = 1.0
        interval_scale = 1
        num_interval = 192
        img_hw = [{H}, {W}]
    }}""")["d"]
    ds = DTUDataset(conf, "val")
    item = ds[0]
    assert item["hw"].tolist() == [H // 2, W // 2]
    assert item["rays_o"].shape == ((H // 2) * (W // 2), 3)
    assert item["file_name"] == "scan24_view1_light3"


@pytest.fixture(scope="module")
def bmvs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bmvs")
    scan = "5a0271884e62597cdee0d0eb"
    os.makedirs(root / scan / "cams", exist_ok=True)
    os.makedirs(root / scan / "blended_images", exist_ok=True)
    os.makedirs(root / scan / "rendered_depth_maps", exist_ok=True)
    with open(root / scan / "cams/pair.txt", "w") as f:
        f.write("3\n")
        for ref in range(3):
            srcs = [v for v in range(3) if v != ref]
            f.write(f"{ref}\n{len(srcs)} " +
                    " ".join(f"{s} {10 - i}" for i, s in enumerate(srcs)) + "\n")
    rng = np.random.RandomState(1)
    for vid in range(3):
        write_cam(root / scan / f"cams/{vid:08d}_cam.txt", vid)
        img = (rng.rand(72, 96, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / scan / f"blended_images/{vid:08d}_masked.jpg")
        depth = rng.rand(72, 96).astype(np.float32) * 2 + 2.5
        write_pfm(str(root / scan / f"rendered_depth_maps/{vid:08d}.pfm"), depth)
    return str(root), scan


def test_bmvs_dataset(bmvs_root):
    root, scan = bmvs_root
    from surf_tpu.data.mvs_generic import BMVSDataset
    conf = ConfigFactory.parse_string(f"""
    d {{
        data_dir = {root}
        scene = [{scan}]
        ref_view = [1]
        src_views = [0, 2]
        num_src_view = 2
        val_res_level = 2
        factor = 1.0
        interval_scale = 1
        num_interval = 100
        img_hw = [{H}, {W}]
    }}""")["d"]
    ds = BMVSDataset(conf, "val")
    item = ds[0]
    assert item["imgs"].shape == (3, H, W, 3)
    assert int(item["src_idx"]) == 1
    assert item["view_ids"].tolist() == [1, 0, 2]


@pytest.fixture(scope="module")
def neus_root(tmp_path_factory):
    """Miniature NeuS-preprocessed DTU layout (cameras_sphere.npz +
    image/mask dirs) for DTUDatasetFinetuneNeuS
    (reference datasets/dtu_finetune_neus.py:75-140)."""
    root = tmp_path_factory.mktemp("neus")
    scan = "scan24"
    base = root / f"neus_data/data_DTU/dtu_{scan}"
    os.makedirs(base / "image", exist_ok=True)
    os.makedirs(base / "mask", exist_ok=True)
    os.makedirs(root / "Cameras", exist_ok=True)
    os.makedirs(root / f"PseudoMVSScore/dtu_exp/{scan}/filtered_avg_depth",
                exist_ok=True)
    os.makedirs(root / "PseudoMVSDepth", exist_ok=True)

    with open(root / "Cameras/pair.txt", "w") as f:
        f.write("5\n")
        for ref in range(5):
            srcs = [v for v in range(5) if v != ref][:4]
            f.write(f"{ref}\n{len(srcs)} " +
                    " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) + "\n")

    rng = np.random.RandomState(1)
    cams = {}
    intr = np.eye(4, dtype=np.float32)
    intr[:3, :3] = np.array([[800.0, 0, 800], [0, 800, 600], [0, 0, 1]])
    scale = np.eye(4, dtype=np.float32) * 2.0
    scale[3, 3] = 1.0
    scale[:3, 3] = [0.1, 0.2, 0.3]
    for vid in range(5):
        ang = vid * 0.3
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0],
                      [0, 0, 1]], np.float32)
        extr = np.eye(4, dtype=np.float32)
        extr[:3, :3] = R
        extr[:3, 3] = [0.1 * vid, 0.05 * vid, 4.0]
        cams[f"world_mat_{vid}"] = intr @ extr
        cams[f"scale_mat_{vid}"] = scale
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(base / f"image/{vid:0>6}.png")
        mask = (rng.rand(H, W) > 0.3).astype(np.uint8) * 255
        Image.fromarray(mask).save(base / f"mask/{vid:0>3}.png")
        depth = rng.rand(H, W).astype(np.float32) * 2 + 2.5
        write_pfm(str(root / f"PseudoMVSScore/dtu_exp/{scan}/"
                             f"filtered_avg_depth/{vid:0>8}.pfm"), depth)
    np.savez(base / "cameras_sphere.npz", **cams)
    write_ply(str(root / "PseudoMVSDepth/mvsnet024_l3.ply"),
              rng.randn(500, 3).astype(np.float32))
    return str(root)


def test_dtu_finetune_neus_dataset(neus_root):
    from surf_tpu.data.dtu_finetune import DTUDatasetFinetuneNeuS

    conf = ConfigFactory.parse_string(f"""
    ds {{
        data_dir = {neus_root}
        img_hw = [{H}, {W}]
        n_rays = 32
        scene = scan24
        ref_view = 2
        val_res_level = 4
    }}
    """)["ds"]
    ds = DTUDatasetFinetuneNeuS(conf)
    assert ds.all_views[0] == 2 and len(ds.all_views) == 3

    init = ds.get_all_images()
    assert init["imgs"].shape == (3, H, W, 3)
    assert init["intrs"].shape == (3, 4, 4) and init["c2ws"].shape == (3, 4, 4)

    b = ds.get_random_rays(0, rng=np.random.RandomState(0))
    assert b["rays_o"].shape == (32, 3) and b["rays_d"].shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(b["rays_d"], axis=-1), 1.0,
                               atol=1e-5)
    assert b["pseudo_pts"].shape == (2048, 3)
    assert np.isfinite(b["pseudo_depth"]).all()
    # pseudo points land in the unit-sphere frame ((pw - t) / s)
    assert np.abs(b["pseudo_pts"]).max() < 10.0

    v = ds.get_rays_at(2)
    hw = (H // 4) * (W // 4)
    assert v["rays_o"].shape == (hw, 3)
    assert v["masks"].shape == (3, H, W)
    assert v["scale_mat"].shape == (4, 4)
    # scale_mat maps the unit frame back to world: s on the diagonal
    np.testing.assert_allclose(v["scale_mat"][0, 0], 2.0, atol=1e-5)
