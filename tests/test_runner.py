"""End-to-end runner smoke tests on the synthetic dataset: a short train
loop, a validation pass producing a mesh + renders, and the finetune path."""

import json
import os
import types

import numpy as np
import pytest

from tiny_conf import TINY
from surf_tpu.config import ConfigFactory

pytestmark = pytest.mark.slow


def make_args(tmp_path, mode, conf_path, **kw):
    return types.SimpleNamespace(
        mode=mode, conf=conf_path, resume=None, mesh_resolution=48,
        clean_mesh=False, scene=None, ref_view=None, load_vol=False, seed=0,
        **kw)


@pytest.fixture(scope="module")
def conf_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("exp")
    conf = TINY.replace("./exp/tiny", str(d / "exp"))
    conf = conf.replace("epochs = 2", "epochs = 1")
    conf = conf.replace("val_freq = 10", "val_freq = 1")
    conf += """
    finetune_dataset {
        dataset_name = SyntheticDatasetFinetune
        num_src_view = 2
        img_hw = [64, 80]
        n_rays = 64
        val_res_level = 8
        n_views_total = 6
    }
    """
    p = d / "tiny.conf"
    p.write_text(conf)
    return str(p)


def test_train_and_validate(conf_path, tmp_path):
    from surf_tpu.runner import Runner

    args = make_args(tmp_path, "train", conf_path)
    runner = Runner(args)
    # shorten: 1 epoch over 12 metas is still ~12 steps; cut the dataset
    runner.train_loader.dataset.metas = runner.train_loader.dataset.metas[:2]
    runner.val_loader.dataset.metas = runner.val_loader.dataset.metas[:1]
    runner.val_chunk = 512
    runner.train()

    # checkpoint written
    ckpts = os.listdir(os.path.join(runner.base_exp_dir, "checkpoints"))
    assert any(c.endswith(".npz") for c in ckpts)
    # validation artifacts in the reference layout
    meshes = os.listdir(os.path.join(runner.base_exp_dir, "meshes"))
    assert any(m.endswith(".ply") for m in meshes)
    assert os.path.isdir(os.path.join(runner.base_exp_dir, "val_img"))
    assert os.path.isdir(os.path.join(runner.base_exp_dir, "val_render_depth"))

    # resume path: reload checkpoint
    ckpt_path = os.path.join(runner.base_exp_dir, "checkpoints", sorted(ckpts)[-1])
    args2 = make_args(tmp_path, "val", conf_path, )
    args2.resume = ckpt_path
    runner2 = Runner(args2)
    runner2.val_loader.dataset.metas = runner2.val_loader.dataset.metas[:1]
    runner2.val_chunk = 512
    runner2.mesh_resolution = 32
    metrics = runner2.validate(0)
    assert np.isfinite(metrics["psnr"])


def test_finetune(conf_path, tmp_path):
    from surf_tpu.runner import Runner

    # finetune requires a resume checkpoint; make a fresh one
    args0 = make_args(tmp_path, "train", conf_path)
    r0 = Runner(args0)
    r0.save(0)
    ckpt = os.path.join(r0.base_exp_dir, "checkpoints", "model_000.ckpt.npz")

    args = make_args(tmp_path, "finetune", conf_path)
    args.resume = ckpt
    args.scene = "syn0"
    args.ref_view = 0
    runner = Runner(args)
    runner.epochs = 2
    runner.save_freq = 2
    runner.val_freq = 1000  # skip inline val (covered above)
    # pre-finetune baseline export (train.val_before_finetune): a step-1
    # mesh must exist so the finetune improvement is measurable
    runner.conf["train"]["val_before_finetune"] = True
    runner.mesh_resolution = 32
    runner.finetune()
    ckpts = os.listdir(os.path.join(runner.base_exp_dir, "checkpoints"))
    assert any(c.endswith(".npz") for c in ckpts)
    meshes = os.listdir(os.path.join(runner.base_exp_dir, "meshes"))
    assert any("step-1" in m for m in meshes), meshes

    # volume-only checkpoint reloads through --load_vol (surf.py:47-54)
    ft_ckpt = os.path.join(runner.base_exp_dir, "checkpoints", sorted(ckpts)[-1])
    args2 = make_args(tmp_path, "val", conf_path)
    args2.resume = ft_ckpt
    args2.load_vol = True
    r2 = Runner(args2)
    assert r2.has_vol
    assert len(r2.vol_state["stages"]) == len(r2.vol_state["volumes"])
    assert hasattr(r2.vol_state["grids"][0], "parent_table")

    # finetune-mode --load_vol resume: the restored volumes MUST survive
    # _init_volumes (a volume-only ckpt has no feature-net weights to
    # rebuild from; reference load_vol semantics, runner.py:320-329) and
    # further finetune steps must run on them
    args3 = make_args(tmp_path, "finetune", conf_path)
    args3.resume = ft_ckpt
    args3.load_vol = True
    args3.scene = "syn0"
    args3.ref_view = 0
    r3 = Runner(args3)
    saved_vols = jax_tree_leaves_np(runner.ft_params["volumes"])
    resumed_vols = jax_tree_leaves_np(r3.ft_params["volumes"])
    assert len(saved_vols) == len(resumed_vols)
    for a, b in zip(saved_vols, resumed_vols):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
    r3.epochs = 1
    r3.save_freq = 1000
    r3.val_freq = 1000
    r3.conf["train"]["val_before_finetune"] = False
    r3.finetune()


def jax_tree_leaves_np(tree):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
