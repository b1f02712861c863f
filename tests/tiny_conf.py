"""Tiny 2-stage model + synthetic-scene config used across tests: small
volumes (16^3 base), low-res images, CPU-runnable in seconds."""

from surf_tpu.config import ConfigFactory

TINY = """
general { base_exp_dir = ./exp/tiny }

train_dataset {
    dataset_name = SyntheticDataset
    num_src_view = 2
    img_hw = [64, 80]
    n_rays = 64
    n_scenes = 2
    n_views_total = 6
}

val_dataset {
    dataset_name = SyntheticDataset
    num_src_view = 2
    img_hw = [64, 80]
    val_res_level = 4
    n_scenes = 1
    n_views_total = 6
}

train {
    lr_conf { feat_lr = 1e-3  mlp_lr = 5e-4 }
    epochs = 2
    anneal_end = 1
    warmup = 1
    alpha = 0.02
    save_freq = 1
    log_freq = 1
    val_freq = 10
    loss {
        color_weight = 1.0
        sparse_weight = 0.02
        igr_weight = 0.1
        sparse_scale_factor = 100
        mfc_weight = 1.0
        smooth_weight = 0.0001
        tv_weight = 0.0
        depth_weight = 0.0
        ptloss_weight = 1.0
        pseudo_auxi_depth_weight = 1.0
        pseudo_sdf_weight = 1.0
        stage_weights = [0.5, 1.0]
        pseudo_depth_weight = 1.0
    }
}

model {
    range_ratios = [1.0, 0.4]
    feature_network { d_in = 3  d_base = 8  d_out = [4, 4] }
    volume {
        base_volume_dim = [16, 16, 16]
        stage_parent_capacity = [512, 1024]
    }
    reg_network {
        d_in = [8, 16]
        d_base = [8, 8]
        d_out = [8, 8]
    }
    matching_field {
        n_samples_depths = [16, 8]
        n_importance_depths = [16, 8]
        up_sample_steps = [2, 2]
        depth_res_levels = [4, 2]
    }
    implicit_surface {
        sdf_network {
            d_out = 129
            d_in = 3
            d_hidden = 128
            n_layers = 6
            skip_in = [3]
            multires = 4
            bias = 0.5
            scale = 1.0
            geometric_init = True
            weight_norm = True
            feat_channels = 14
            feat_multires = 0
        }
        color_network { d_feature = 8 }
        variance_network { init_val = 0.3 }
        render {
            n_samples = [16, 8]
            sample_ranges = [1.0, 0.4]
            n_depth = 32
            perturb = 1.0
        }
    }
}
"""


def tiny_conf():
    return ConfigFactory.parse_string(TINY)
