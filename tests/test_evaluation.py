"""End-to-end tests of the offline evaluation pipeline (evaluation/
clean_mesh.py + evaluation/dtu_eval.py) on synthetic fixtures with
hand-computable expected values.

Reference protocol: evaluation/clean_mesh.py:282-316 (mask + frustum
cleaning), evaluation/dtu_eval.py:51-190 (lattice sampling, ObsMask/plane
filters, truncated Chamfer).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
from scipy.io import savemat

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from surf_tpu.geometry import Mesh  # noqa: E402
from surf_tpu.io.ply import write_ply  # noqa: E402


def _load_script(name):
    path = os.path.join(os.path.dirname(__file__), "..", "evaluation", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"evaluation_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


dtu_eval = _load_script("dtu_eval")
clean_mesh_script = _load_script("clean_mesh")


# ---------------------------------------------------------------------------
# dtu_eval unit properties
# ---------------------------------------------------------------------------

def test_sample_mesh_points_covers_triangle():
    """Lattice sampling at spacing t fills a triangle: every interior point
    of the triangle is within ~t of a sample (dtu_eval.py:51-82)."""
    verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    pts = dtu_eval.sample_mesh_points(verts, faces, 0.5)
    assert np.allclose(pts[:, 2], 0)
    # all samples inside the triangle (barycentric)
    assert (pts[:, 0] >= -1e-9).all() and (pts[:, 1] >= -1e-9).all()
    assert (pts[:, 0] + pts[:, 1] <= 10 + 1e-6).all()
    # probe random interior points: nearest sample within the lattice pitch
    rng = np.random.default_rng(0)
    u = rng.uniform(0, 1, (200, 2))
    u = np.where(u.sum(-1, keepdims=True) > 1, 1 - u, u)
    probes = np.concatenate([u * 10, np.zeros((200, 1))], -1)
    from scipy.spatial import cKDTree
    d = cKDTree(pts).query(probes)[0]
    assert d.max() < 0.75


def test_radius_downsample_min_spacing():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 5, (2000, 3))
    down = dtu_eval.radius_downsample(pts, 0.4)
    from scipy.spatial import cKDTree
    d = cKDTree(down).query(down, k=2)[0][:, 1]
    assert (d >= 0.4 - 1e-9).all()
    # and it still covers the volume
    cover = cKDTree(down).query(pts)[0]
    assert cover.max() < 0.4 + 1e-9
    # the pair-graph greedy == the reference's per-point greedy ball loop
    perm = np.random.default_rng(0).permutation(len(pts))
    p = pts[perm]
    tree = cKDTree(p)
    alive = np.ones(len(p), bool)
    for i in range(len(p)):
        if alive[i]:
            alive[tree.query_ball_point(p[i], 0.4)] = False
            alive[i] = True
    np.testing.assert_array_equal(down, p[alive])


@pytest.mark.slow
def test_radius_downsample_scales():
    """DTU-scale sanity (VERDICT r2 #7): 2M points must downsample in well
    under a minute — the full 15-scan eval then projects to < 30 min CPU."""
    import time
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 120, (2_000_000, 3)).astype(np.float32)
    t0 = time.time()
    down = dtu_eval.radius_downsample(pts, 0.2)
    dt = time.time() - t0
    assert len(down) > 0
    print(f"radius_downsample 2M pts: {dt:.1f} s")
    assert dt < 120, f"downsample too slow: {dt:.1f}s for 2M points"


def test_official_mask_border_semantics():
    """The offline mask filter (reference evaluation/clean_mesh.py:130-135)
    pads masks with a ones border and indexes with round(+1): a point one
    pixel OUTSIDE the image must count as visible, a point inside a zero
    mask region must not."""
    clean = clean_mesh_script
    h, w = 8, 10
    masks = np.zeros((1, h, w), np.float32)
    masks[0, 2:5, 3:7] = 1.0
    # identity projection: P = [I | 0] -> image coords = (x/z, y/z)
    projs = [np.concatenate([np.eye(3, dtype=np.float64),
                             np.zeros((3, 1))], axis=1)]

    def vis(x, y):
        pts = np.array([[x, y, 1.0]])
        return bool(clean.clean_points_by_mask_official(
            pts, masks, projs, minimal_vis=0)[0])

    assert vis(4, 3)            # inside the mask
    assert not vis(8, 6)        # inside the image, outside the mask
    assert vis(-1, 4)           # 1 px left of the image: ones border
    assert vis(4, -1)           # 1 px above
    # the +1 shift makes the border asymmetric (matlab-style): the right
    # ones-column is unreachable — x just past the right edge is out of
    # bounds, exactly as in the reference's in_mask window
    assert not vis(w - 0.4, 4)
    assert not vis(-2.2, 4)     # 2+ px outside: out of in_mask bounds


# ---------------------------------------------------------------------------
# dtu_eval end-to-end: plane-vs-plane with known Chamfer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dtu_eval_fixture(tmp_path_factory):
    """Mesh = plane z=0; GT points = plane z=2 -> Chamfer == 2.0."""
    root = tmp_path_factory.mktemp("dtu_eval")
    out_dir = root / "outputs"
    dataset_dir = root / "evaluation"
    (out_dir / "meshes" / "final").mkdir(parents=True)
    (dataset_dir / "ObsMask").mkdir(parents=True)
    (dataset_dir / "Points" / "stl").mkdir(parents=True)

    # mesh: [10,50]^2 plane at z=0, 4x4 quads
    g = np.linspace(10, 50, 5)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    verts = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], -1)
    faces = []
    for i in range(4):
        for j in range(4):
            a = i * 5 + j
            faces += [[a, a + 5, a + 1], [a + 1, a + 5, a + 6]]
    Mesh(verts.astype(np.float32), np.asarray(faces, np.int32)).export(
        str(out_dir / "meshes" / "final" / "scan24.ply"))

    # GT "stl" points: grid on z=2 with the SAME lateral extent as the mesh
    # (matching extents keep both directed distances at exactly ~2.0; an
    # inset/outset would inflate one of them with edge effects)
    gs = np.arange(10, 50.01, 0.5)
    sx, sy = np.meshgrid(gs, gs, indexing="ij")
    stl = np.stack([sx.ravel(), sy.ravel(), np.full(sx.size, 2.0)], -1)
    write_ply(str(dataset_dir / "Points" / "stl" / "stl024_total.ply"),
              stl.astype(np.float32))

    # ObsMask covering everything; BB in the loadmat convention (2,3)
    BB = np.array([[0.0, 0.0, -5.0], [60.0, 60.0, 5.0]], np.float64)
    ObsMask = np.ones((61, 61, 11), np.uint8)
    savemat(str(dataset_dir / "ObsMask" / "ObsMask24_10.mat"),
            {"ObsMask": ObsMask, "BB": BB, "Res": np.array([[1.0]])})
    # ground plane: keep stl points with z + 1 > 0 (all of them)
    savemat(str(dataset_dir / "ObsMask" / "Plane24.mat"),
            {"P": np.array([[0.0], [0.0], [1.0], [1.0]])})
    return str(out_dir), str(dataset_dir)


def test_dtu_eval_known_chamfer(dtu_eval_fixture):
    out_dir, dataset_dir = dtu_eval_fixture
    d2s, s2d, overall = dtu_eval.eval_scan(24, out_dir, dataset_dir)
    # data->stl: every mesh sample is exactly 2.0 above/below the GT plane
    # laterally the stl grid is 0.5-pitched -> max extra sqrt(2^2+0.35^2)-2
    assert abs(d2s - 2.0) < 0.05, d2s
    # stl->data: data sampled at 0.2 pitch -> even tighter
    assert abs(s2d - 2.0) < 0.02, s2d
    assert abs(overall - 2.0) < 0.04, overall


# ---------------------------------------------------------------------------
# clean_mesh end-to-end: sphere + out-of-mask outlier through main()
# ---------------------------------------------------------------------------

def _uv_sphere(radius, center, n_lat=24, n_lon=48):
    lat = np.linspace(0, np.pi, n_lat + 1)[1:-1]
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    la, lo = np.meshgrid(lat, lon, indexing="ij")
    ring = np.stack([np.sin(la) * np.cos(lo), np.sin(la) * np.sin(lo),
                     np.cos(la)], -1).reshape(-1, 3)
    verts = np.concatenate([[[0, 0, 1]], ring, [[0, 0, -1]]]) * radius + center
    faces = []
    top, bot = 0, len(verts) - 1
    idx = lambda i, j: 1 + i * n_lon + (j % n_lon)
    for j in range(n_lon):
        faces.append([top, idx(0, j), idx(0, j + 1)])
        faces.append([bot, idx(n_lat - 2, j + 1), idx(n_lat - 2, j)])
    for i in range(n_lat - 2):
        for j in range(n_lon):
            a, b = idx(i, j), idx(i, j + 1)
            c, d = idx(i + 1, j), idx(i + 1, j + 1)
            faces += [[a, c, b], [b, c, d]]
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def _cube(size, center):
    s = size / 2
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
                 np.float32) + center
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                  [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                  [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def _write_cam(path, w2c, intr3):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for r in w2c:
            f.write(" ".join(f"{x:.8f}" for x in r) + "\n")
        f.write("\nintrinsic\n")
        for r in intr3:
            f.write(" ".join(f"{x:.8f}" for x in r) + "\n")
        f.write("\n500.0 2.5\n")


@pytest.fixture(scope="module")
def clean_mesh_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("clean_mesh")
    out_dir = root / "outputs"
    data_dir = root / "DTU_TEST"
    out_dir.mkdir()
    (data_dir / "scan24" / "mask").mkdir(parents=True)
    (data_dir / "scan24" / "cams").mkdir(parents=True)

    # combined mesh: sphere at origin (kept) + cube at x=800 (projects
    # outside every mask -> dropped by clean_mesh_by_mask)
    sv, sf = _uv_sphere(100.0, np.zeros(3), n_lat=20, n_lon=40)
    cv, cf = _cube(40.0, np.array([800.0, 0.0, 0.0]))
    verts = np.concatenate([sv, cv])
    faces = np.concatenate([sf, cf + len(sv)])
    write_ply(str(out_dir / "scan24_epoch0.ply"), verts, faces)

    h, w = 1200, 1600
    intr3 = np.array([[1400.0, 0, 800.0], [0, 1400.0, 600.0], [0, 0, 1.0]])
    # mask: generous filled disk around the sphere's projection
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((xx - 800) ** 2 + (yy - 600) ** 2 < 300 ** 2).astype(np.uint8) * 255
    from PIL import Image
    view_ids = clean_mesh_script.VIEW_LIST_SET1[:3]
    for k, vid in enumerate(view_ids):
        ang = np.deg2rad((k - 1) * 12.0)
        # camera on a circle of radius 1000 looking at the origin
        Ry = np.array([[np.cos(ang), 0, np.sin(ang)],
                       [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        c2w = np.eye(4)
        c2w[:3, :3] = Ry
        c2w[:3, 3] = Ry @ np.array([0, 0, -1000.0])
        w2c = np.linalg.inv(c2w)
        _write_cam(str(data_dir / "scan24" / "cams" / f"{vid:08d}_cam.txt"),
                   w2c, intr3)
        Image.fromarray(mask).save(
            str(data_dir / "scan24" / "mask" / f"{vid:03d}.png"))
    return str(out_dir), str(data_dir)


def test_clean_mesh_main(clean_mesh_fixture, monkeypatch, capsys):
    out_dir, data_dir = clean_mesh_fixture
    monkeypatch.setattr(sys, "argv", [
        "clean_mesh.py", "--root_dir", data_dir, "--out_dir", out_dir,
        "--n_view", "3", "--set", "1", "--mask_kernel_size", "11"])
    clean_mesh_script.main()
    final = os.path.join(out_dir, "final", "scan24.ply")
    assert os.path.exists(final)
    m = Mesh.load(final)
    # the sphere survives the cc>=500 filter...
    assert len(m.faces) >= 500
    # ...the out-of-mask cube is gone
    assert m.vertices[:, 0].max() < 200.0
    # and the sphere is intact enough to still be sphere-like
    r = np.linalg.norm(m.vertices, axis=-1)
    assert abs(np.median(r) - 100.0) < 2.0
