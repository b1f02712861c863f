"""Is the densified table's LAYOUT the 50 ms gather mystery?

microbench_gather_c: gathers from freshly-random (C, M) tables cost
~0.03 ms.  microbench_stage_lookup: the SAME gather code from
densify_storage's output costs ~50 ms.  Hypothesis: the scatter in
_densify_jit leaves the table in a non-default layout, and every consumer
jit call pays a full-table relayout copy.  Prints the device layouts and
times gathers from (a) the scatter output as-is, (b) after forcing the
default layout.
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
    print(f"  {label:>38s}: {dt:8.2f} ms", flush=True)
    return dt


@jax.jit
def g(f, i):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(1,), start_index_map=(1,))
    return jax.lax.gather(f, i[:, None], dn,
                          slice_sizes=(f.shape[0], 1),
                          mode=jax.lax.GatherScatterMode.CLIP).sum(
                              dtype=jnp.float32)


def fmt(x):
    try:
        return str(x.format.layout)
    except Exception:
        try:
            return str(x.layout)
        except Exception:
            return "?"


def main():
    rng = np.random.default_rng(0)
    res = 704
    cap = 393216
    n_idx = 557_056 * 8
    idx = jnp.asarray(rng.integers(0, res ** 3, size=n_idx).astype(np.int32))

    half = res // 2
    v = rng.normal(size=(cap * 2, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pc = np.round((v * 0.5 + 1.0) * 0.5 * (half - 1)).astype(np.int32)
    pc = np.unique(pc, axis=0)[:cap]
    pad = cap - pc.shape[0]
    pvalid = np.concatenate([np.ones(pc.shape[0], bool), np.zeros(pad, bool)])
    pc = np.concatenate([pc, np.zeros((pad, 3), np.int32)])
    grid = sp.make_grid(jnp.asarray(pc), jnp.asarray(pvalid),
                        jnp.asarray(np.repeat(pvalid, 8)), res)
    storage = jax.random.normal(jax.random.PRNGKey(0), (grid.capacity, 7))

    st = sp.densify_storage(grid, storage)
    flat = st.flat
    print(f"# densified layout: {fmt(flat)}")
    bench("gather from densified", g, flat, idx)

    fresh = jax.random.normal(jax.random.PRNGKey(1), flat.shape,
                              jnp.bfloat16)
    print(f"# fresh layout:     {fmt(fresh)}")
    bench("gather from fresh random", g, fresh, idx)

    # force default layout via an elementwise jit (XLA picks default
    # layouts for jit outputs unless told otherwise)
    relay = jax.jit(lambda x: x * 1)(flat)
    print(f"# relaid layout:    {fmt(relay)}")
    bench("gather from relaid", g, relay, idx)


if __name__ == "__main__":
    main()
