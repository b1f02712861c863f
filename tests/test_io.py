import numpy as np

from surf_tpu.io import read_ply, write_ply, read_pfm, write_pfm


def test_ply_roundtrip_binary(tmp_path):
    verts = np.random.RandomState(0).randn(20, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], dtype=np.int64)
    p = tmp_path / "mesh.ply"
    write_ply(str(p), verts, faces, binary=True)
    out = read_ply(str(p))
    np.testing.assert_allclose(out["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(out["faces"], faces)


def test_ply_roundtrip_ascii(tmp_path):
    verts = np.random.RandomState(1).randn(7, 3).astype(np.float32)
    p = tmp_path / "pc.ply"
    write_ply(str(p), verts, binary=False)
    out = read_ply(str(p))
    np.testing.assert_allclose(out["vertices"], verts, atol=1e-5)


def test_pfm_roundtrip(tmp_path):
    depth = np.random.RandomState(2).rand(12, 16).astype(np.float32)
    p = tmp_path / "d.pfm"
    write_pfm(str(p), depth)
    out, scale = read_pfm(str(p))
    np.testing.assert_allclose(out, depth, atol=1e-7)
