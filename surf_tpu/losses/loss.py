"""Aggregate training loss (functional re-design of models/losses/loss.py):
masked L1 color, eikonal, annealed exp-sparseness, second-order smoothness,
masked top-2 NCC over surface patches (mfc), per-stage photometric warping
and pseudo-depth L1 on matching-field depths (train mode only), |SDF| at
pseudo points, pseudo/GT depth L1 on the rendered depth."""

from __future__ import annotations

import jax.numpy as jnp

from .ncc import compute_lncc
from .photometric import compute_ptloss


def make_loss_config(conf):
    return {
        "color_weight": conf.get_float("color_weight"),
        "sparse_scale_factor": conf.get_float("sparse_scale_factor"),
        "sparse_weight": conf.get_float("sparse_weight"),
        "igr_weight": conf.get_float("igr_weight"),
        "mfc_weight": conf.get_float("mfc_weight"),
        "smooth_weight": conf.get_float("smooth_weight"),
        "depth_weight": conf.get_float("depth_weight"),
        "ptloss_weight": conf.get_float("ptloss_weight"),
        "pseudo_auxi_depth_weight": conf.get_float("pseudo_auxi_depth_weight"),
        "pseudo_sdf_weight": conf.get_float("pseudo_sdf_weight"),
        "stage_weights": conf.get_list("stage_weights"),
        "pseudo_depth_weight": conf.get_float("pseudo_depth_weight"),
    }


def _masked_l1(pred, target, mask):
    return (jnp.abs(pred - target) * mask).sum() / (mask.sum() + 1e-8)


def compute_loss(cfg, preds, targets, step, mode="train"):
    valid_mask = preds["valid_mask"].astype(jnp.float32)
    if "mask" in targets:
        valid_mask = valid_mask * targets["mask"].reshape(-1, 1)

    color_err = jnp.abs(preds["color_fine"] - targets["color"])
    color_loss = (color_err * valid_mask).sum() / (valid_mask.sum() + 1e-5)

    eikonal_loss = jnp.mean(preds["gradient_error"])

    anneal = jnp.minimum(1.0, jnp.asarray(step) / 2.0)
    sparse_loss = jnp.mean(
        jnp.exp(-jnp.abs(preds["sparse_sdf"]) * cfg["sparse_scale_factor"])) * anneal

    smooth_loss = jnp.mean(preds["smooth_error"])

    ncc = compute_lncc(preds["ref_gray_val"], preds["sampled_gray_val"])
    ncc_mask = valid_mask * preds["mid_inside_sphere"]
    mfc_loss = 0.5 * jnp.squeeze(
        (ncc * ncc_mask).sum(axis=0) / (ncc_mask.sum(axis=0) + 1e-8))

    photo_loss = 0.0
    pseudo_auxi_depth_loss = 0.0
    auxi_depth_loss = 0.0
    auxi_depth_loss0 = 0.0
    src_auxi_depth_loss = 0.0
    if mode == "train":
        n_stages = len(cfg["stage_weights"])
        for i in range(n_stages):
            d_ref = preds[f"depth_stage{i}"]
            d_src = preds[f"depth_src_stage{i}"]
            ref_photo = compute_ptloss(d_ref, targets["imgs"], targets["mask_ref"],
                                       targets["intrs"], targets["c2ws"])
            src_photo = compute_ptloss(d_src, targets["imgs"], targets["mask_src"],
                                       targets["intrs"], targets["c2ws"],
                                       ref_idx=targets["src_idx"], topk=1)
            photo_loss = photo_loss + (ref_photo + src_photo) * cfg["stage_weights"][i]

            pm_ref = (targets["pseudo_depth_ref"] > 0).astype(jnp.float32)
            pm_src = (targets["pseudo_depth_src"] > 0).astype(jnp.float32)
            pa = _masked_l1(d_ref, targets["pseudo_depth_ref"], pm_ref)
            pa_src = _masked_l1(d_src, targets["pseudo_depth_src"], pm_src)
            pseudo_auxi_depth_loss = pseudo_auxi_depth_loss + \
                (pa + pa_src) * cfg["stage_weights"][i]

        last = n_stages - 1
        auxi_depth_loss = _masked_l1(preds[f"depth_stage{last}"],
                                     targets["depth_ref"], targets["mask_ref"])
        src_auxi_depth_loss = _masked_l1(preds[f"depth_src_stage{last}"],
                                         targets["depth_src"], targets["mask_src"])
        auxi_depth_loss0 = _masked_l1(preds["depth_stage0"],
                                      targets["depth_ref"], targets["mask_ref"])

    pseudo_sdf_loss = jnp.mean(jnp.abs(preds["pseudo_sdf"])) \
        if "pseudo_sdf" in preds else 0.0

    pseudo_depth_loss = 0.0
    if "pseudo_depth" in targets:
        pm = (targets["pseudo_depth"] > 0).astype(jnp.float32)
        pseudo_depth_loss = _masked_l1(preds["render_depth"], targets["pseudo_depth"], pm)

    depth_loss = 0.0
    if "depth" in targets:
        dm = (targets["depth"] > 0).astype(jnp.float32)
        depth_loss = _masked_l1(preds["render_depth"], targets["depth"], dm)

    loss = (color_loss * cfg["color_weight"]
            + eikonal_loss * cfg["igr_weight"]
            + sparse_loss * cfg["sparse_weight"]
            + mfc_loss * cfg["mfc_weight"]
            + smooth_loss * cfg["smooth_weight"]
            + depth_loss * cfg["depth_weight"]
            + photo_loss * cfg["ptloss_weight"]
            + pseudo_auxi_depth_loss * cfg["pseudo_auxi_depth_weight"]
            + pseudo_sdf_loss * cfg["pseudo_sdf_weight"]
            + pseudo_depth_loss * cfg["pseudo_depth_weight"])

    return {
        "loss": loss,
        "color_loss": color_loss,
        "eikonal_loss": eikonal_loss,
        "sparse_loss": sparse_loss,
        "mfc_loss": mfc_loss,
        "smooth_loss": smooth_loss,
        "depth_loss": depth_loss,
        "photo_loss": photo_loss,
        "auxi_depth_loss": auxi_depth_loss,
        "pseudo_auxi_depth_loss": pseudo_auxi_depth_loss,
        "src_auxi_depth_loss": src_auxi_depth_loss,
        "pseudo_sdf_loss": pseudo_sdf_loss,
        "auxi_depth_loss0": auxi_depth_loss0,
        "pseudo_depth_loss": pseudo_depth_loss,
    }
