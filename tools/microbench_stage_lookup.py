"""Per-stage attribution of the SDF lookup cost at protocol scale.

profile_components reports ~143 ms for the 4-stage lookups at 557k points,
but a bare 8-column-gather from a 352^3 C=8 table measures ~0.8 ms
(microbench_slice_gather).  This times sdf_net.lookup_stage_features's
stages INDIVIDUALLY on the same packed/dense storages the bench uses, plus
raw gathers from each table, to find where the two orders of magnitude go
(table size? clamping arithmetic? concat? weight math?).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from surf_tpu.ops import sparse as sp


def bench(label, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"  {label:>34s}: {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n_pts = 557_056
    base = 88
    caps = [(base // 2) ** 3, (base // 2) ** 3, 262144, 393216]
    print(f"# device={jax.devices()[0].device_kind} n_pts={n_pts}")

    # points on a sphere shell (the real render's distribution)
    v = rng.normal(size=(n_pts, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray((v * (0.5 + rng.normal(size=(n_pts, 1)) * 0.05))
                      .astype(np.float32))

    stages = []
    for s in range(4):
        res = base * 2 ** s
        half = res // 2
        n = caps[s] * 2
        w = rng.normal(size=(n, 3))
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        pc = np.round((w * (0.5 + rng.normal(size=(n, 1)) * 0.03) + 1.0)
                      * 0.5 * (half - 1)).astype(np.int32)
        pc = np.unique(pc, axis=0)[:caps[s]]
        pad = caps[s] - pc.shape[0]
        pvalid = np.concatenate([np.ones(pc.shape[0], bool),
                                 np.zeros(pad, bool)])
        pc = np.concatenate([pc, np.zeros((pad, 3), np.int32)])
        grid = sp.make_grid(jnp.asarray(pc), jnp.asarray(pvalid),
                            jnp.asarray(np.repeat(pvalid, 8)), res)
        storage = jax.random.normal(jax.random.PRNGKey(s),
                                    (grid.capacity, 7))
        stages.append((grid, sp.densify_storage(grid, storage)))
    stages = sp.pack_stages(stages)
    jax.block_until_ready(stages[-1][1].flat)
    stages_ff = stages[::-1]

    for i, (grid, st) in enumerate(stages_ff):
        kind = type(st).__name__

        @jax.jit
        def one(st, p):
            return sp.sparse_trilinear(grid, st, p)

        bench(f"stage {i} ({grid.res}^3 {kind})", one, st, pts)

    from surf_tpu.nn import sdf_net

    @jax.jit
    def lookups(st, p):
        return sdf_net.lookup_stage_features(p, st)

    bench("all 4 concat", lookups, stages_ff, pts)

    # raw gather rate from the biggest table for reference
    flat704 = stages_ff[0][1].flat
    idx = jnp.asarray(rng.integers(0, flat704.shape[1],
                                   size=n_pts * 8).astype(np.int32))

    @jax.jit
    def raw(f, i):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(1,), start_index_map=(1,))
        return jax.lax.gather(f, i[:, None], dn,
                              slice_sizes=(f.shape[0], 1),
                              mode=jax.lax.GatherScatterMode.CLIP).sum(
                                  dtype=jnp.float32)

    bench(f"raw 8n gathers 704^3 table", raw, flat704, idx)


if __name__ == "__main__":
    main()
