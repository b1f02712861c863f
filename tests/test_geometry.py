import numpy as np

from surf_tpu.geometry import Mesh, marching_cubes
from surf_tpu.geometry.raycast import RayMeshIntersector
from surf_tpu.geometry.clean_mesh import clean_mesh_outside_frustum


def sphere_mesh(r=0.6, n=40):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - r
    v, t = marching_cubes(-sdf, 0.0)
    v = v / (n - 1) * 2 - 1
    return Mesh(v, t)


def test_raycast_sphere():
    mesh = sphere_mesh()
    inter = RayMeshIntersector(mesh)
    origins = np.array([[0, 0, -3.0], [0, 0, -3.0], [2.0, 2.0, -3.0]], np.float32)
    dirs = np.array([[0, 0, 1.0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
    tri, t = inter.intersects_first(origins, dirs)
    assert tri[0] >= 0 and abs(t[0] - 2.4) < 0.02    # hits front of sphere
    assert tri[1] == -1                              # parallel miss
    assert tri[2] == -1                              # offset miss


def test_mesh_transform_and_components():
    mesh = sphere_mesh()
    n_f = len(mesh.faces)
    labels, n = mesh.face_adjacency_components()
    assert n == 1
    # add a distant floater triangle
    base = len(mesh.vertices)
    mesh.vertices = np.concatenate(
        [mesh.vertices, np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5.0]])])
    mesh.faces = np.concatenate([mesh.faces, [[base, base + 1, base + 2]]])
    labels, n = mesh.face_adjacency_components()
    assert n == 2

    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    T[:3, :3] *= 2.0
    v0 = mesh.vertices[0].copy()
    mesh.apply_transform(T)
    np.testing.assert_allclose(mesh.vertices[0], v0 * 2 + [1, 2, 3])


def test_clean_outside_frustum_drops_floater():
    mesh = sphere_mesh()
    n_orig = len(mesh.faces)
    base = len(mesh.vertices)
    # floater far outside all camera rays
    mesh.vertices = np.concatenate(
        [mesh.vertices, np.array([[50, 50, 50], [50.1, 50, 50], [50, 50.1, 50]])])
    mesh.faces = np.concatenate([mesh.faces, [[base, base + 1, base + 2]]])
    h, w = 32, 32
    f = 30.0
    intr = np.eye(4); intr[0, 0] = intr[1, 1] = f; intr[0, 2] = w / 2; intr[1, 2] = h / 2
    c2ws = []
    for ang in [0, np.pi / 2, np.pi]:
        cpos = 3.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
        fwd = -cpos / np.linalg.norm(cpos)
        up = np.array([0, 0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, down, fwd], 1)
        c2w[:3, 3] = cpos
        c2ws.append(c2w)
    masks = np.ones((3, h, w), np.float32)
    out = clean_mesh_outside_frustum(mesh, masks, np.stack([intr] * 3),
                                     np.stack(c2ws), upscale=2, min_cc=10)
    assert len(out.faces) <= n_orig           # floater gone
    # only first-hit faces from 3 sparse viewpoints survive — expect the
    # camera-facing portion of the sphere, not all of it
    assert len(out.faces) > n_orig * 0.15


def test_extract_geometry_block_skip_exact():
    """Block-skipped, batched-call extraction == dense evaluation of the
    same (occupancy-pinned) SDF over the full lattice."""
    import jax
    import jax.numpy as jnp
    from surf_tpu.ops import sparse as sp
    from surf_tpu.geometry.extract import extract_geometry

    # one occupied octant
    parents = np.stack(np.meshgrid(*([np.arange(4)] * 3), indexing="ij"),
                       -1).reshape(-1, 3).astype(np.int32)
    grid = sp.make_grid(jnp.asarray(parents), jnp.ones(64, bool),
                        jnp.ones(512, bool), 16)
    stages = [(grid, None)]

    def sdf_fn(params, stages_, occ, pts):
        m = sp.occupancy_nearest(stages_[0][0], pts, align_corners=False)
        s = jnp.linalg.norm(pts + 0.6, axis=-1) - 0.45
        return jnp.where(m, s, 100.0)

    R, B = 48, 16
    verts, tris, u = extract_geometry(sdf_fn, None, stages, R, block=B,
                                      blocks_per_call=3)
    lin = np.linspace(-1, 1, R, dtype=np.float32)
    xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel(), zs.ravel()], -1))
    u_ref = np.asarray(sdf_fn(None, stages, None, pts)).reshape(R, R, R)
    np.testing.assert_allclose(u, u_ref, atol=1e-6)
    assert len(verts) > 0  # the sphere surface is inside the occupied octant
