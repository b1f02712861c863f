"""Persistent XLA compilation cache.

The full-protocol cascade compiles ~1000 s of graphs on a cold process
(BENCH build_first_s); the persistent cache makes every subsequent process
restart skip those compiles entirely (verified on the axon TPU backend:
executables serialize/deserialize across processes).  The reference has no
analogue — PyTorch eager pays no compile, so this is TPU-build-specific
infrastructure (SURVEY.md §7 "host/device split").

Call ``enable_persistent_cache()`` before the first jit compilation; safe
to call any time (jax.config.update works post-import) and idempotent.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_time_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    <repo>/.jax_cache, overridable with $JAX_COMPILATION_CACHE_DIR).
    Returns the directory in use."""
    global _enabled
    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
