"""Data-parallel training step over a virtual device mesh: scenes sharded
on the ``data`` axis, params replicated, gradients all-reduced by XLA —
the TPU-native replacement for the reference's NCCL DDP (SURVEY.md §2.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tiny_conf import tiny_conf
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.nn import surf
from surf_tpu.losses import make_loss_config
from surf_tpu.parallel import make_mesh, make_dp_train_step, stack_batches

pytestmark = pytest.mark.slow


def test_dp_train_step_4_devices():
    n_dev = 4
    devices = jax.devices()[:n_dev]
    assert len(devices) == n_dev, "conftest should provide 8 virtual devices"
    mesh = make_mesh(devices)

    conf = tiny_conf()
    conf["train_dataset"]["n_scenes"] = n_dev
    conf["train_dataset"]["n_rays"] = 32
    ds = SyntheticDataset(conf["train_dataset"], "train")
    params, state, static = surf.init(jax.random.PRNGKey(0), conf["model"])
    loss_cfg = make_loss_config(conf["train.loss"])
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    step, sharded, replicated = make_dp_train_step(optimizer, static, loss_cfg, mesh)

    batches = [ds[i] for i in range(n_dev)]
    batch = {k: jax.device_put(jnp.asarray(v), sharded)
             for k, v in stack_batches(batches).items()}
    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(1), n_dev), sharded)
    params_r = jax.device_put(params, replicated)
    state_r = jax.device_put(state, replicated)
    opt_r = jax.device_put(opt_state, replicated)
    before = jax.tree.map(np.asarray, params_r)  # params_r is donated below

    new_params, new_state, new_opt, res = step(
        params_r, state_r, opt_r, batch, keys, jnp.float32(0.0), jnp.float32(1.0))
    jax.block_until_ready(new_params)
    assert np.isfinite(float(res["loss"]))
    assert np.isfinite(float(res["psnr"]))
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - b, new_params, before), 0.0)
    assert delta > 0


def test_distribute_single_process_noop():
    """Single-process runs must not call jax.distributed.initialize
    (reference: the 'Not using distributed mode' branch,
    utils/distribute.py:76-79)."""
    from surf_tpu.parallel.distribute import detect_multiprocess_env, maybe_initialize
    assert detect_multiprocess_env({}) is None
    assert detect_multiprocess_env({"SLURM_NTASKS": "1"}) is None
    assert maybe_initialize(None, environ={}) is False


def test_distribute_env_detection():
    from surf_tpu.parallel.distribute import detect_multiprocess_env
    kw = detect_multiprocess_env({
        "JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234",
        "JAX_NUM_PROCESSES": "4",
        "JAX_PROCESS_ID": "2",
    })
    assert kw == {"coordinator_address": "10.0.0.1:1234",
                  "num_processes": 4, "process_id": 2}
    # SLURM rendezvous: jax reads SLURM_* itself -> empty kwargs
    assert detect_multiprocess_env({"SLURM_NTASKS": "8"}) == {}
