"""Controlled gather-cost attribution: channel window size x table rows.

microbench_stage_lookup found 8x column gathers cost 0.77 ms from a
(8, 352^3) table but ~50 ms from a (7, 704^3) table.  Separates the two
factors: C in {1, 7, 8, 16} (sublane alignment of the gather window) and
M in {352^3, 704^3} (table size), bf16 and f32.
"""

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def bench(label, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"  {label:>30s}: {dt:8.2f} ms", flush=True)
    return dt


@jax.jit
def g(f, i):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(1,), start_index_map=(1,))
    return jax.lax.gather(f, i[:, None], dn,
                          slice_sizes=(f.shape[0], 1),
                          mode=jax.lax.GatherScatterMode.CLIP).sum(
                              dtype=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    n_idx = 557_056 * 8
    print(f"# device={jax.devices()[0].device_kind} n_idx={n_idx}")
    for M, mlabel in [(352 ** 3, "352^3"), (704 ** 3, "704^3")]:
        idx = jnp.asarray(rng.integers(0, M, size=n_idx).astype(np.int32))
        for C in (1, 7, 8, 16):
            for dt in ("bfloat16", "float32"):
                if C * M * jnp.dtype(dt).itemsize > 6 * 2 ** 30:
                    continue
                tab = jax.random.normal(jax.random.PRNGKey(C), (C, M),
                                        jnp.dtype(dt))
                bench(f"({C}, {mlabel}) {dt}", g, tab, idx)
                del tab


if __name__ == "__main__":
    main()
