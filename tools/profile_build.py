"""Per-stage timing of the cascade build (the 507s/scene problem).

Runs surf.build_volumes stage by stage at the full protocol, twice: the
first pass includes compiles, the second is steady state.  Reports per-stage
wall time so the build cost can be attributed (compile vs compute vs host
orchestration).

Usage: python tools/profile_build.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from bench import protocol_conf
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.nn import surf, feature_net


def main():
    base_dim = int(os.environ.get("PROF_BASE_DIM", 88))
    n_stages = int(os.environ.get("PROF_STAGES", 4))
    conf = protocol_conf(4096, base_dim, n_stages, (288, 400))

    ds = SyntheticDataset(conf["ds"], "train")
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()
             if not isinstance(v, str)}
    params, state, static = surf.init(jax.random.PRNGKey(0), conf["model"])

    feat_fn = jax.jit(feature_net.apply)
    features = feat_fn(params["feature_network"], batch["imgs"])
    jax.block_until_ready(features)

    frozen = surf._freeze(static)
    print(f"# device={jax.devices()[0].device_kind} stages={n_stages} "
          f"base={base_dim}")

    for rep in range(2):
        label = "compile+run" if rep == 0 else "steady"
        carry = (None, None, None, None)
        keys = jax.random.split(jax.random.PRNGKey(1), n_stages)
        t_total = time.time()
        for s in range(n_stages):
            t0 = time.time()
            fn = surf._jit_stage_cached(frozen, s, False, False)
            grid_new, rest_new, stage_out, _ = fn(
                params, state["reg_network"][s], batch, features, keys[s],
                carry[0], tuple(carry[1:]))
            jax.block_until_ready(rest_new)
            carry = (grid_new, *rest_new)
            print(f"  [{label}] stage {s} (res {base_dim * 2**s}): "
                  f"{time.time() - t0:6.1f} s")
        print(f"  [{label}] total build: {time.time() - t_total:6.1f} s")


if __name__ == "__main__":
    main()
