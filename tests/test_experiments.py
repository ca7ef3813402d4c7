"""Shipped 2D-pose experiment presets vs the reference's 15 experiment yamls.

Every preset in gastx.pipeline.hrnet.experiments must equal the config the
reference produces by merging the same-named yaml from
lib/pose/hrnet/experiments/ over the default tree (update_config,
lib/pose/hrnet/lib/config/default.py:126-153), and must be directly usable
to construct the corresponding backbone.
"""
import os
import sys

import numpy as np
import pytest

from gastx.pipeline.hrnet import (
    default_config,
    experiment_config,
    experiment_names,
    resnet_extra,
    update_config,
)

from reference_torch import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

EXP_DIR = REFERENCE_PATH + "/lib/pose/hrnet/experiments"


def _normalize(node):
    """Plain-dict view, GPUS dropped (yaml spells the tuple as a string —
    a yacs type quirk irrelevant to the TPU build)."""
    if isinstance(node, dict):
        return {k: _normalize(v) for k, v in node.items() if k != "GPUS"}
    if isinstance(node, tuple):
        return list(node)
    return node


def test_all_fifteen_presets_ship():
    names = experiment_names()
    assert len(names) == 15
    assert sum("hrnet" in n for n in names) == 6
    assert sum("resnet" in n for n in names) == 9
    assert sum(n.startswith("mpii/") for n in names) == 5


@requires_reference
@pytest.mark.parametrize("name", experiment_names())
def test_preset_matches_reference_yaml(name):
    yaml_path = os.path.join(EXP_DIR, name + ".yaml")
    assert os.path.exists(yaml_path), yaml_path

    want = update_config(default_config(), yaml_path)
    got = experiment_config(name)
    assert _normalize(got) == _normalize(want)


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        experiment_config("coco/hrnet/w64_does_not_exist")


def test_resnet_extra_matches_models_py_defaults():
    # reference lib/pose/hrnet/lib/config/models.py:15-22
    extra = resnet_extra(50)
    assert extra["NUM_LAYERS"] == 50
    assert extra["NUM_DECONV_FILTERS"] == [256, 256, 256]
    assert extra["NUM_DECONV_KERNELS"] == [4, 4, 4]
    assert extra["DECONV_WITH_BIAS"] is False
    assert extra["FINAL_CONV_KERNEL"] == 1


@requires_reference
def test_mpii_resnet_preset_constructs_pose_resnet():
    """The mpii res50 preset drives the reference model factory directly and
    its state_dict round-trips through the gastx importer
    (lib/pose/hrnet/lib/models/pose_resnet.py:261-271)."""
    import torch

    models_dir = REFERENCE_PATH + "/lib/pose/hrnet/lib/models"
    if models_dir not in sys.path:
        sys.path.insert(0, models_dir)
    import pose_resnet as ref_mod

    from gastx.pipeline.hrnet.pose_resnet import import_pose_resnet_params

    cfg = experiment_config("mpii/resnet/res50_256x256_d256x3_adam_lr1e-3")
    assert cfg.MODEL.NAME == "pose_resnet"
    assert cfg.MODEL.NUM_JOINTS == 16
    assert cfg.MODEL.EXTRA.NUM_LAYERS == 50

    torch.manual_seed(0)
    model = ref_mod.get_pose_net(cfg, is_train=False)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_pose_resnet_params(sd, num_layers=50)
    # 16-joint final conv made it through
    final = params["final_layer"]["w"]
    assert final.shape[-1] == 16


@requires_reference
def test_mpii_hrnet_preset_constructs_hrnet():
    """The mpii w32 preset constructs the reference PoseHighResolutionNet and
    its weights import into the gastx param tree."""
    import torch

    models_dir = REFERENCE_PATH + "/lib/pose/hrnet/lib/models"
    if models_dir not in sys.path:
        sys.path.insert(0, models_dir)
    import pose_hrnet as ref_mod

    from gastx.pipeline.hrnet import import_hrnet_params

    cfg = experiment_config("mpii/hrnet/w32_256x256_adam_lr1e-3")
    assert cfg.MODEL.NUM_JOINTS == 16
    assert cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS == [32, 64, 128, 256]

    torch.manual_seed(0)
    model = ref_mod.PoseHighResolutionNet(cfg)
    model.eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_hrnet_params(sd, cfg.MODEL.EXTRA)
    assert params["final_layer"]["w"].shape[-1] == 16
