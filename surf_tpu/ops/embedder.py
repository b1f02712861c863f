"""NeRF positional encoding (functional re-derivation of the reference's
models/modules/embedder.py: include-input, log-sampled frequencies, sin/cos
interleaved per frequency)."""

from __future__ import annotations

import jax.numpy as jnp


def embedder(multires: int, input_dims: int = 3):
    """Returns (embed_fn, out_dim).

    Frequency bands 2^0 .. 2^(multires-1); per band appends sin(f*x) then
    cos(f*x); input itself is included first — the exact channel order the
    reference produces (embedder.py:11-36), which matters for weight
    conversion of the SDF MLP's first layer.
    """
    if multires <= 0:
        return (lambda x: x), input_dims
    freqs = 2.0 ** jnp.arange(multires, dtype=jnp.float32)
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x):
        parts = [x]
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim
