"""End-to-end forward smoke test: synthetic scene -> cascade -> render ->
loss, on a tiny 2-stage config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_conf import tiny_conf
from surf_tpu.data.synthetic import SyntheticDataset
from surf_tpu.nn import surf
from surf_tpu.losses import compute_loss, make_loss_config

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    conf = tiny_conf()
    ds = SyntheticDataset(conf["train_dataset"], "train")
    batch = ds[0]
    ipts = {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray) or np.isscalar(v)}
    params, state, static = surf.init(jax.random.PRNGKey(0), conf["model"])
    return conf, ipts, params, state, static


def test_forward_shapes_and_finiteness(setup):
    conf, ipts, params, state, static = setup
    fwd = jax.jit(lambda p, s, b: surf.forward(
        jax.random.PRNGKey(1), p, s, static, "train", b,
        cos_anneal_ratio=0.5, step=0.0))
    outputs, new_state = fwd(params, state, ipts)
    n_rays = ipts["rays_o"].shape[0]
    assert outputs["color_fine"].shape == (n_rays, 3)
    assert outputs["render_depth"].shape == (n_rays,)
    assert outputs["sdf_depth"].shape == (n_rays, 1)
    assert outputs["depth_stage0"].shape == tuple(ipts["imgs"].shape[1:3])
    assert outputs["depth_stage1"].shape == tuple(ipts["imgs"].shape[1:3])
    for k in ["color_fine", "render_depth", "gradient_error", "sparse_sdf",
              "sdf_depth", "ref_gray_val", "sampled_gray_val"]:
        assert np.all(np.isfinite(np.asarray(outputs[k]))), k


def test_loss_and_grads(setup):
    conf, ipts, params, state, static = setup
    cfg = make_loss_config(conf["train.loss"])

    def loss_fn(p):
        outputs, _ = surf.forward(
            jax.random.PRNGKey(1), p, state, static, "train", ipts,
            cos_anneal_ratio=0.5, step=0.0)
        res = compute_loss(cfg, outputs, ipts, step=0.5, mode="train")
        return res["loss"], res

    (loss, res), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert np.isfinite(float(loss))
    # every major component contributes a finite value
    for k, v in res.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # gradients reach the feature network, sdf net, blending net and agg mlp
    gnorms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    flat = jax.tree_util.tree_leaves_with_path(gnorms)
    total = {"feature_network": 0.0, "implicit_surface": 0.0,
             "volume": 0.0, "reg_network": 0.0}
    for path, v in flat:
        key = path[0].key if hasattr(path[0], "key") else str(path[0])
        if key in total:
            total[key] += v
        assert np.isfinite(v), path
    for k, v in total.items():
        assert v > 0, f"no gradient signal into {k}"
