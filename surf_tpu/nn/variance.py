"""NeuS single-parameter variance network (reference:
models/modules/variance_network.py): ``inv_s = exp(10 * variance)``."""

import jax.numpy as jnp


def init(conf):
    return {"variance": jnp.asarray(conf.get_float("init_val"))}


def inv_s(params):
    return jnp.exp(params["variance"] * 10.0)
