"""Can one multi-element-slice gather replace the 8 per-corner gathers?

The render's trilinear lookups are gather-latency-bound (PERF_NOTES): cost
scales with the number of gather OFFSETS, not bytes.  XLA gather supports
multi-element slice_sizes, so with a channel-major (C, X, Y, Z) volume a
single gather with slice_sizes=(C, 2, 2, 2) fetches a sample's whole
trilinear footprint per offset — the same 8x offset reduction PackedStorage
buys with 8x memory, but at ZERO extra memory.  This measures whether the
TPU lowering actually delivers it (vs decomposing into strided fetches).

Variants at the two protocol-scale lookup shapes:
  a) 8 column gathers from (C, M) flat       -- current dense_trilinear
  b) 1 gather, slice (C,1,1,2), 4 offsets/pt -- z-pairs (contiguous minor)
  c) 1 gather, slice (C,1,2,2), 2 offsets/pt
  d) 1 gather, slice (C,2,2,2), 1 offset/pt  -- full footprint
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
    print(f"  {label:>34s}: {dt:8.2f} ms", flush=True)
    return dt


def column_gather(flat, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(1,), start_index_map=(1,))
    return jax.lax.gather(flat, idx[:, None].astype(jnp.int32), dn,
                          slice_sizes=(flat.shape[0], 1),
                          mode=jax.lax.GatherScatterMode.CLIP)


def slice_gather(vol, starts, window):
    """vol (C, X, Y, Z); starts (n, 3) -> (n, C * prod(window))."""
    C = vol.shape[0]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(1, 2, 3))
    out = jax.lax.gather(vol, starts.astype(jnp.int32), dn,
                         slice_sizes=(C,) + window,
                         mode=jax.lax.GatherScatterMode.CLIP)
    return out.reshape(out.shape[0], -1)


def main():
    rng = np.random.default_rng(0)
    print(f"# device={jax.devices()[0].device_kind}")

    for res, C, n_pts, label in [
        (352, 8, 557_056, "sdf-lookup 352^3 C=8"),
        (704, 8, 557_056, "sdf-lookup 704^3 C=8"),
        (704, 1, 1_048_576, "z_vals 704^3 C=1"),
    ]:
        key = jax.random.PRNGKey(res + C)
        # generate bf16 natively: an f32 temp at (8, 704^3) is 11 GB
        vol = jax.random.normal(key, (C, res, res, res), jnp.bfloat16)
        flat = vol.reshape(C, res * res * res)
        c0 = rng.integers(0, res - 1, size=(n_pts, 3)).astype(np.int32)
        starts = jnp.asarray(c0)

        @jax.jit
        def a_cols(flat, c0):
            out = None
            for k in range(8):
                ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
                rows = ((c0[:, 0] + ox) * res + c0[:, 1] + oy) * res \
                    + c0[:, 2] + oz
                v = column_gather(flat, rows)
                out = v if out is None else out + v
            return out.sum(dtype=jnp.float32)

        def make_slice(window, n_off):
            offs = []
            for ox in range(2 // window[0]):
                for oy in range(2 // window[1]):
                    for oz in range(2 // window[2]):
                        offs.append((ox * window[0], oy * window[1],
                                     oz * window[2]))
            offs = jnp.asarray(offs, jnp.int32)  # (n_off, 3)

            @jax.jit
            def f(vol, c0):
                st = (c0[:, None, :] + offs[None]).reshape(-1, 3)
                g = slice_gather(vol, st, window)
                return g.sum(dtype=jnp.float32)
            return f

        print(f"{label} (n={n_pts}):")
        bench("a) 8 column gathers", a_cols, flat, starts)
        bench("b) slice (C,1,1,2) x4 offsets", make_slice((1, 1, 2), 4),
              vol, starts)
        bench("c) slice (C,1,2,2) x2 offsets", make_slice((1, 2, 2), 2),
              vol, starts)
        bench("d) slice (C,2,2,2) x1 offset", make_slice((2, 2, 2), 1),
              vol, starts)


if __name__ == "__main__":
    main()
