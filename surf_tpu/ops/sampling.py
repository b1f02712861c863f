"""Ray sample placement utilities.

``sample_pdf`` is the NeRF inverse-CDF importance sampler the reference
keeps available (implicit_surface.py:14-48; its call site is commented out
at 313-324 in favor of surface-centric sampling, but it is part of the
component surface).  Deterministic or stratified-random modes, static
shapes, searchsorted-based.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(key, bins, weights, n_samples, det=False):
    """bins (n, b), weights (n, b) -> samples (n, n_samples).

    Matches the reference's CDF construction: cdf = cumsum(w)/(sum(w)+1e-6)
    (no zero prepend — implicit_surface.py:23), right-side searchsorted,
    linear interpolation within the located bin.
    """
    n, b = weights.shape
    cdf = jnp.cumsum(weights, axis=1) / (jnp.sum(weights, axis=1, keepdims=True) + 1e-6)

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (n, n_samples))
    else:
        u = jax.random.uniform(key, (n, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, b - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=1)
    bins_b = jnp.take_along_axis(bins, below, axis=1)
    bins_a = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
