"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates real multi-chip compilation separately via
__graft_entry__.dryrun_multichip)."""

import os

# hard override: the environment presets JAX_PLATFORMS=axon (remote TPU) and
# a sitecustomize registers the axon PJRT plugin at interpreter start, which
# ignores the env var — unit tests must run on local CPU with virtual
# devices, so force it through the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: recompiles of unchanged test graphs are free
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
