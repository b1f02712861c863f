"""Does spatial locality of gather indices matter on TPU?

Times XLA row-gathers from protocol-sized tables with (a) uniform random
indices, (b) block-clustered indices (same rows, sorted within chunks),
(c) fully sorted indices.  If clustered/sorted gathers are materially
faster, brick-reordering the sparse tables / storage rows (Morton layout)
is worth building; if not, gather cost is index-count-bound and the
optimization is dead.

Also times bf16 vs f32 tables (bandwidth vs latency attribution).
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


def bench(label, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"  {label:>28s}: {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    n_idx = 8_388_608            # ~ the z_vals corner-gather count
    print(f"# device={jax.devices()[0].device_kind} n_idx={n_idx}")

    for n_rows, c, dtype, label in [
        (43_614_208, 1, "int32", "parent-table 352^3 int32"),
        (348_913_664, 1, "float32", "dense 704^3 f32"),
        (348_913_664, 1, "bfloat16", "dense 704^3 bf16"),
        (3_145_728, 7, "float32", "storage (3.1M,7) f32"),
        (3_145_728, 7, "bfloat16", "storage (3.1M,7) bf16"),
        (3_145_728, 8, "bfloat16", "storage (3.1M,8) bf16"),
        (3_145_728, 128, "bfloat16", "storage (3.1M,128) bf16"),
    ]:
        # generate on device (tunnel upload is slow) with the target dtype
        key = jax.random.PRNGKey(n_rows % 97 + c)
        if dtype == "int32":
            table = jax.random.randint(key, (n_rows, c), 0, 1000, jnp.int32)
        else:
            table = jax.random.normal(key, (n_rows, c), jnp.float32
                                      ).astype(jnp.dtype(dtype))
        idx_rand = jnp.asarray(
            rng.integers(0, n_rows, size=n_idx).astype(np.int32))
        idx_sorted = jnp.sort(idx_rand)
        # clustered: random rows but sorted within 1024-index chunks
        ir = np.asarray(idx_rand).reshape(-1, 1024)
        idx_clustered = jnp.asarray(np.sort(ir, axis=1).reshape(-1))
        # local: random within a small 1% window sliding over the table
        win = max(n_rows // 100, 1)
        base = (np.arange(n_idx) // 1024 * 997) % max(n_rows - win, 1)
        idx_local = jnp.asarray(
            (base + rng.integers(0, win, size=n_idx)).astype(np.int32))

        @jax.jit
        def g(t, i):
            return t[i].sum(dtype=jnp.float32)

        print(f"table {label}:")
        bench("uniform random", g, table, idx_rand)
        bench("chunk-sorted (1K)", g, table, idx_clustered)
        bench("1%-window local", g, table, idx_local)
        bench("fully sorted", g, table, idx_sorted)
        del table


if __name__ == "__main__":
    main()
