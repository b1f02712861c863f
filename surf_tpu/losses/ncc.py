"""Patch NCC for multi-view feature consistency.

Functional re-design of the reference's ``compute_LNCC2``
(models/losses/ncc.py:7-51).  The reference computes patch sums with grouped
box-filter convolutions evaluated at the patch center — mathematically just
sums over the patch axis, which is how they are written here.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_lncc(ref_gray, src_grays):
    """
    ref_gray:  (n, p*p, c)        reference patches
    src_grays: (s, n, p*p, c)     source-view patches
    Returns (n, 1): mean of the two lowest (1 - NCC^2) across sources,
    clamped to [0, 2].
    """
    npatch = ref_gray.shape[1]
    ref = jnp.transpose(ref_gray, (0, 2, 1))[:, None]          # (n,1,c,pp)
    src = jnp.transpose(src_grays, (1, 0, 3, 2))               # (n,s,c,pp)

    ref_sum = jnp.sum(ref, -1)
    src_sum = jnp.sum(src, -1)
    ref_sq_sum = jnp.sum(ref ** 2, -1)
    src_sq_sum = jnp.sum(src ** 2, -1)
    ref_src_sum = jnp.sum(ref * src, -1)

    u_ref = ref_sum / npatch
    u_src = src_sum / npatch

    cross = ref_src_sum - u_src * ref_sum - u_ref * src_sum + u_ref * u_src * npatch
    ref_var = ref_sq_sum - 2 * u_ref * ref_sum + u_ref * u_ref * npatch
    src_var = src_sq_sum - 2 * u_src * src_sum + u_src * u_src * npatch

    cc = cross * cross / (ref_var * src_var + 1e-5)            # (n,s,c)
    ncc = jnp.clip(1.0 - cc, 0.0, 2.0).mean(axis=2)            # (n,s)
    k = min(2, ncc.shape[1])
    low2 = jnp.sort(ncc, axis=1)[:, :k]                        # k smallest
    return jnp.mean(low2, axis=1, keepdims=True)
