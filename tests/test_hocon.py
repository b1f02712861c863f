import os

from surf_tpu.config import ConfigFactory

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "confs")


def test_parse_surf_conf():
    conf = ConfigFactory.parse_file(os.path.join(CONF_DIR, "surf.conf"))
    assert conf.get_int("train.epochs") == 16
    assert conf.get_float("train.lr_conf.feat_lr") == 1e-3
    assert conf.get_float("train.lr_conf.mlp_lr") == 5e-4
    assert conf.get_list("model.range_ratios") == [1.0, 0.4, 0.1, 0.01]
    assert conf.get_list("model.volume.base_volume_dim") == [88, 88, 88]
    assert conf.get_bool("model.implicit_surface.sdf_network.geometric_init") is True
    assert conf["train_dataset.dataset_name"] == "DTUDataset"
    assert conf.get_list("train_dataset.img_hw") == [480, 640]
    assert conf.get_list("train.loss.stage_weights") == [0.25, 0.5, 0.75, 1.0]
    # subtree access like the reference runner does (runner.py:46)
    lr_conf = conf["train.lr_conf"]
    assert lr_conf["mlp_lr"] == 5e-4
    # defaults
    assert conf.get_bool("model.has_vol", default=False) is False
    assert conf.get_list("val_dataset.scene", default=None) is None
    # item assignment (runner.py:42-43)
    conf["finetune_dataset"] = {}
    conf["finetune_dataset"]["scene"] = "scan24"
    assert conf["finetune_dataset.scene"] == "scan24"


def test_parse_inline_features():
    conf = ConfigFactory.parse_string(
        """
        a {
            path = <some placeholder path>   # trailing comment
            nested_list = [[-1, 1], [-1, 1], [-1, 1]]
            multi = [1,
                     2,
                     3]
            flag = False
            sci = 5e-4
            neg = -3
            s = "quoted string"
        }
        """
    )
    assert conf["a.path"] == "<some placeholder path>"
    assert conf.get_list("a.nested_list") == [[-1, 1], [-1, 1], [-1, 1]]
    assert conf.get_list("a.multi") == [1, 2, 3]
    assert conf.get_bool("a.flag") is False
    assert conf.get_float("a.sci") == 5e-4
    assert conf.get_int("a.neg") == -3
    assert conf.get_string("a.s") == "quoted string"
