"""SDF grid evaluation -> host marching cubes, with exact block skipping.

Reference: ImplicitSurface.extract_geometry (implicit_surface.py:337-357)
evaluates the SDF over a dense lattice in 64^3 chunks and runs marching
cubes on -sdf.  Here, blocks of the lattice that no stage's active voxel
set touches are skipped exactly (the occupancy mask pins their SDF to +100
anyway — see ops/sparse.occupied_blocks_host), which typically avoids
70-90% of the MLP work after end-to-end sparsification.  Occupied blocks
are evaluated several per device call, the lattice points are generated
ON DEVICE from 3-int block origins (a (G*B^3, 3) host-built lattice is a
25 MB H2D transfer per call over a remote-tunnel TPU), and every call is
dispatched asynchronously with a single host-side conversion pass at the
end — compute, D2H and host scatter overlap across calls.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .marching_cubes import marching_cubes
from ..ops.sparse import occupied_blocks_host


def extract_geometry(sdf_fn, params, stages, resolution, block=64, occ=None,
                     blocks_per_call=8, ray_mesh=None):
    """sdf_fn(params, stages, occ, pts (m,3)) -> (m,) SDF values (jitted by
    the caller; ``occ`` may be None or an ops.sparse.OccupancyVolume for
    single-gather visibility).  Returns (verts [-1,1]-frame, tris, u).

    ``ray_mesh``: optional 1-D jax mesh — the lattice points of each group
    are sharding-constrained across its devices so XLA SPMD splits the SDF
    evaluation (the point axis is embarrassingly parallel; SURVEY §5)."""
    import os
    R = int(resolution)
    B = int(block)
    # more blocks per dispatch amortizes per-call tunnel overhead at the
    # cost of G*B^3-point transients in sdf_fn (PERF_NOTES round-5 #4)
    G = int(os.environ.get("SURF_MESH_BLOCKS_PER_CALL", blocks_per_call))
    nb = -(-R // B)
    blocks = occupied_blocks_host(stages, R, B)

    u = np.full((R, R, R), 100.0, np.float32)

    occupied = [(bx, by, bz)
                for bx in range(nb) for by in range(nb) for bz in range(nb)
                if blocks[bx, by, bz]]

    def block_slices(b):
        bx, by, bz = b
        return (slice(bx * B, min((bx + 1) * B, R)),
                slice(by * B, min((by + 1) * B, R)),
                slice(bz * B, min((bz + 1) * B, R)))

    if ray_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        pts_sharding = NamedSharding(ray_mesh, PartitionSpec(ray_mesh.axis_names[0]))
    else:
        pts_sharding = None

    @jax.jit
    def eval_group(params, stages, occ, origins):
        """origins (G, 3) int32 lattice block starts -> (G*B^3,) SDF.
        Lattice indices past R-1 clamp (their rows land in the padding the
        host scatter discards — partial edge blocks copy only their true
        extent)."""
        ar = jnp.arange(B, dtype=jnp.int32)
        idx = jnp.minimum(origins[:, :, None] + ar[None, None, :], R - 1)
        scale = 2.0 / (R - 1.0)
        px = -1.0 + scale * idx[:, 0].astype(jnp.float32)  # (G, B)
        py = -1.0 + scale * idx[:, 1].astype(jnp.float32)
        pz = -1.0 + scale * idx[:, 2].astype(jnp.float32)
        shp = (G, B, B, B)
        pts = jnp.stack([
            jnp.broadcast_to(px[:, :, None, None], shp),
            jnp.broadcast_to(py[:, None, :, None], shp),
            jnp.broadcast_to(pz[:, None, None, :], shp),
        ], axis=-1).reshape(-1, 3)
        if pts_sharding is not None:
            pts = jax.lax.with_sharding_constraint(pts, pts_sharding)
        return sdf_fn(params, stages, occ, pts)

    # dispatch every group asynchronously; convert (sync) afterwards
    pending = []
    for s in range(0, len(occupied), G):
        group = occupied[s:s + G]
        origins = np.zeros((G, 3), np.int32)
        origins[:len(group)] = np.asarray(group, np.int32) * B
        pending.append((group, eval_group(params, stages, occ,
                                          jnp.asarray(origins))))

    # ONE batched D2H for all groups: per-array np.asarray pays the
    # remote-tunnel round-trip latency per call; device_get on the whole
    # list coalesces the transfers (PERF_NOTES round-5 #4)
    all_vals = jax.device_get([v for _, v in pending])
    for (group, _), vals in zip(pending, all_vals):
        vals = vals.reshape(G, B, B, B)
        for i, b in enumerate(group):
            sx, sy, sz = block_slices(b)
            ex, ey, ez = (sx.stop - sx.start, sy.stop - sy.start,
                          sz.stop - sz.start)
            u[sx, sy, sz] = vals[i, :ex, :ey, :ez]

    verts, tris = marching_cubes(-u, 0.0)
    verts = verts / (R - 1.0) * 2.0 - 1.0
    return verts, tris, u
