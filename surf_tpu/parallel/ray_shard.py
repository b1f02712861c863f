"""Ray-axis sharding for validation rendering and mesh SDF evaluation.

The reference loops the full-image render in 256-ray chunks on one GPU
(implicit_surface.py:367-370) and the mesh SDF grid in 64^3 blocks
(implicit_surface.py:338-341).  The per-ray / per-point computation is
embarrassingly parallel, so the TPU-native plan (SURVEY.md §5
"long-context analogue") shards the ray (point) axis across the device
mesh: one jit, ray arguments annotated with a ``rays`` PartitionSpec,
volumes and parameters replicated, XLA SPMD partitioning the whole render
body.  The chunk a single chip rendered now runs 1/N-per-chip with no
change to the render itself.

Determinism: jax's counter-based threefry PRNG produces identical per-ray
jitter regardless of partitioning, so sharded and single-device renders
are numerically equal (asserted by ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ray_mesh(devices=None, axis_name="rays"):
    """A 1-D mesh over all local devices for ray sharding (None if there is
    only one device — callers fall back to a plain jit)."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) <= 1:
        return None
    return Mesh(np.array(devices), (axis_name,))


def shard_rays_jit(fn, mesh, n_args, ray_argnums, *, axis_name="rays",
                   donate_argnums=()):
    """jit ``fn`` (of ``n_args`` positional arguments) with the arguments at
    ``ray_argnums`` sharded on their leading axis over ``mesh`` and every
    other argument replicated (prefix shardings broadcast over pytrees).

    The ray-axis length of each sharded argument must be divisible by the
    device count (chunked callers already pad to the chunk size — size the
    chunk as a multiple of ``mesh.size``).
    """
    ray_argnums = set(ray_argnums)
    sharded = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    in_shardings = tuple(sharded if i in ray_argnums else replicated
                         for i in range(n_args))
    return jax.jit(fn, in_shardings=in_shardings,
                   donate_argnums=donate_argnums)
