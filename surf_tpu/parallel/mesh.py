"""Multi-chip data parallelism over a jax device mesh.

Replaces the reference's NCCL DistributedDataParallel + DistributedSampler
stack (runner.py:102, utils/distribute.py, datasets/__init__.py:38): scenes
are stacked on a leading ``data`` axis sharded across the mesh, the
per-scene forward is vmapped, and XLA inserts the gradient/metric
all-reduces over ICI — no hand-written communication.

The same step runs unchanged on 1 chip, an 8-device CPU test mesh, or a
multi-host TPU slice (after jax.distributed.initialize()).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn import surf
from ..losses import compute_loss


def make_mesh(devices=None, axis_name="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def stack_batches(batches):
    """Stack per-scene dicts along a new leading axis (device axis)."""
    keys = batches[0].keys()
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in keys
            if not isinstance(batches[0][k], str)}


def shard_batch(batch, mesh, axis_name="data"):
    sharding = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}


def process_slice(n_global):
    """(start, count) of this process's scenes within a global super-batch of
    ``n_global`` = jax.device_count() scenes.  A 1-D mesh over jax.devices()
    orders devices by process, so process p owns the contiguous slice
    [p*local, (p+1)*local)."""
    local = jax.local_device_count()
    return jax.process_index() * local, local


def make_global_batch(local_batch, mesh, axis_name="data"):
    """Assemble a globally-sharded batch from PROCESS-LOCAL scene stacks.

    ``local_batch``: dict of numpy arrays with leading axis =
    jax.local_device_count() (this process's scenes only).  Returns global
    jax.Arrays of leading axis jax.device_count() without any process ever
    materializing remote scenes — the multi-host replacement for a global
    device_put (reference: DistributedSampler keeps per-rank subsets,
    datasets/__init__.py:38).  Single-process this equals shard_batch.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    n_global = mesh.devices.size

    def put(v):
        v = np.asarray(v)
        global_shape = (n_global,) + v.shape[1:]
        return jax.make_array_from_process_local_data(sharding, v, global_shape)

    return {k: put(v) for k, v in local_batch.items()}


def make_dp_train_step(optimizer, static, loss_cfg, mesh, axis_name="data"):
    """Build the jitted data-parallel train step.

    Signature: step(params, state, opt_state, batch, keys, step_f, anneal)
      batch: dict of arrays with leading scene axis (= mesh size),
      keys: (n_scenes, 2) PRNG keys.
    Params/opt state replicated; the scene axis sharded; the mean loss makes
    XLA emit a psum over ``data`` for the gradients.
    """
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))

    def per_scene(params, state, b, key, step_f, anneal):
        outputs, new_state = surf.forward(
            key, params, state, static, "train", b,
            cos_anneal_ratio=anneal, step=step_f)
        res = compute_loss(loss_cfg, outputs, b, step_f, "train")
        psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(
            jnp.mean((outputs["color_fine"] - b["color"]) ** 2) + 1e-12))
        res["psnr"] = psnr
        return res["loss"], (res, new_state)

    @partial(jax.jit, donate_argnums=(0, 2))
    def step(params, state, opt_state, batch, keys, weights, step_f, anneal):
        """``weights`` (n_scenes,): 1 for real scenes, 0 for tail padding —
        the epoch never drops scenes (ragged last super-batch is padded with
        zero-weight duplicates instead of being discarded)."""

        def loss_fn(p):
            losses, (reses, new_states) = jax.vmap(
                per_scene, in_axes=(None, None, 0, 0, None, None)
            )(p, state, batch, keys, step_f, anneal)
            denom = jnp.maximum(jnp.sum(weights), 1.0)

            def wmean(x):
                w = weights.reshape((-1,) + (1,) * (x.ndim - 1))
                return jnp.sum(x * w, axis=0) / denom

            # scalar metrics weight-averaged across chips (reference:
            # utils/distribute.py reduce_scalar_outputs)
            return (jnp.sum(losses * weights) / denom,
                    (jax.tree.map(wmean, reses), jax.tree.map(wmean, new_states)))

        (loss, (res, new_state)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, res

    return step, sharded, replicated
