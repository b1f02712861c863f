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
    weights = jax.device_put(jnp.ones((n_dev,), jnp.float32), sharded)
    params_r = jax.device_put(params, replicated)
    state_r = jax.device_put(state, replicated)
    opt_r = jax.device_put(opt_state, replicated)
    before = jax.tree.map(np.asarray, params_r)  # params_r is donated below

    new_params, new_state, new_opt, res = step(
        params_r, state_r, opt_r, batch, keys, weights,
        jnp.float32(0.0), jnp.float32(1.0))
    jax.block_until_ready(new_params)
    assert np.isfinite(float(res["loss"]))
    assert np.isfinite(float(res["psnr"]))
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - b, new_params, before), 0.0)
    assert delta > 0


def test_dp_zero_weight_padding_matches_unpadded():
    """A zero-weighted duplicate scene in the super-batch must produce the
    same update as the same real scenes replicated with full weight — the
    ragged-epoch padding never changes the gradient (VERDICT r2 weak #3)."""
    n_dev = 4
    mesh = make_mesh(jax.devices()[:n_dev])

    conf = tiny_conf()
    conf["train_dataset"]["n_scenes"] = 2
    conf["train_dataset"]["n_rays"] = 16
    ds = SyntheticDataset(conf["train_dataset"], "train")
    params, state, static = surf.init(jax.random.PRNGKey(0), conf["model"])
    loss_cfg = make_loss_config(conf["train.loss"])
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step, sharded, replicated = make_dp_train_step(optimizer, static, loss_cfg, mesh)

    a, b = ds[0], ds[1]
    keys2 = np.asarray(jax.random.split(jax.random.PRNGKey(1), 2))
    keys = jax.device_put(jnp.asarray(np.concatenate([keys2, keys2])), sharded)

    params_np = jax.tree.map(np.asarray, params)
    opt_np = jax.tree.map(np.asarray, opt_state)

    def run(items, weights):
        batch = {k: jax.device_put(jnp.asarray(v), sharded)
                 for k, v in stack_batches(items).items()}
        w = jax.device_put(jnp.asarray(weights, jnp.float32), sharded)
        # device_put from host copies: the step donates params/opt_state and
        # would otherwise delete the shared originals between runs
        p = jax.device_put(params_np, replicated)
        s = jax.device_put(state, replicated)
        o = jax.device_put(opt_np, replicated)
        new_p, _, _, res = step(p, s, o, batch, keys, w,
                                jnp.float32(0.0), jnp.float32(1.0))
        return jax.tree.map(np.asarray, new_p), float(res["loss"])

    p_full, l_full = run([a, b, a, b], [1, 1, 1, 1])
    p_pad, l_pad = run([a, b, a, b], [1, 1, 0, 0])
    assert np.isclose(l_full, l_pad, rtol=1e-5)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(x, y, rtol=2e-4,
                                                         atol=1e-6),
                 p_full, p_pad)


def test_process_slice_shard_math(monkeypatch):
    """2-process shard math: process p owns [p*local, (p+1)*local)."""
    from surf_tpu.parallel import process_slice
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert process_slice(8) == (4, 4)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert process_slice(8) == (0, 4)


def test_make_global_batch_single_process():
    """Single-process make_global_batch == shard_batch (the multi-host data
    plane reduces to a plain sharded device_put)."""
    from surf_tpu.parallel import make_global_batch
    n_dev = 4
    mesh = make_mesh(jax.devices()[:n_dev])
    local = {"x": np.arange(n_dev * 3, dtype=np.float32).reshape(n_dev, 3)}
    out = make_global_batch(local, mesh)
    assert out["x"].shape == (n_dev, 3)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])


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
