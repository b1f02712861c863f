"""Checkpoint round-trips: pytree npz save/load and the structure-checked
optimizer-state restore (incl. a multi_transform optimizer — the training
setup's two-LR-group Adam, reference runner.py:94 + surf.py:36-45)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from surf_tpu.utils import save_checkpoint, load_checkpoint, to_jax
from surf_tpu.runner import (_restore_opt_state, _opt_state_to_tree,
                             _opt_state_fingerprint)


def _params():
    return {
        "implicit_surface": {"w": jnp.ones((4, 3)), "b": jnp.zeros(3)},
        "feature_network": {"w": jnp.full((2, 2), 2.0)},
    }


def _optimizer(mlp_lr=1e-3, feat_lr=2e-3):
    def label(params):
        return {k: jax.tree.map(
            lambda _: "mlp" if k == "implicit_surface" else "feat", v)
            for k, v in params.items()}
    return optax.multi_transform(
        {"mlp": optax.adam(mlp_lr), "feat": optax.adam(feat_lr)}, label)


def test_opt_state_roundtrip_multi_transform(tmp_path):
    params = _params()
    opt = _optimizer()
    opt_state = opt.init(params)
    # advance a couple of steps so moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(3):
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, {
        "opt_state": jax.tree.map(np.asarray, _opt_state_to_tree(opt_state)),
        "opt_struct": _opt_state_fingerprint(opt_state),
    })
    ckpt = load_checkpoint(path)

    restored = _restore_opt_state(_optimizer(), params,
                                  ckpt["opt_state"], ckpt["opt_struct"])
    # exact same structure (NamedTuple types restored) and leaf values
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(opt_state)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # and training continues from the restored state identically
    u1, _ = _optimizer().update(grads, restored, params)
    u2, _ = _optimizer().update(grads, opt_state, params)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_opt_state_restore_rejects_structure_change(tmp_path):
    params = _params()
    opt = _optimizer()
    opt_state = opt.init(params)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, {
        "opt_state": jax.tree.map(np.asarray, _opt_state_to_tree(opt_state)),
        "opt_struct": _opt_state_fingerprint(opt_state),
    })
    ckpt = load_checkpoint(path)

    # a *different* optimizer (sgd+momentum: different state layout) must be
    # refused instead of silently mis-attaching leaves
    other = optax.sgd(1e-3, momentum=0.9)
    with pytest.raises(ValueError):
        _restore_opt_state(other, params, ckpt["opt_state"], ckpt["opt_struct"])

    # legacy checkpoints (no fingerprint): leaf shape check still rejects a
    # params-shape mismatch
    bad_params = {
        "implicit_surface": {"w": jnp.ones((5, 3)), "b": jnp.zeros(3)},
        "feature_network": {"w": jnp.full((2, 2), 2.0)},
    }
    with pytest.raises(ValueError):
        _restore_opt_state(_optimizer(), bad_params, ckpt["opt_state"], None)
