from gastx.pipeline.hrnet.config import (
    CfgNode,
    default_config,
    hrnet_extra,
    update_config,
)
from gastx.pipeline.hrnet.experiments import (
    EXPERIMENTS,
    experiment_config,
    experiment_names,
    resnet_extra,
)
from gastx.pipeline.hrnet.model import (
    fold_conv_bn,
    hrnet_forward,
    import_hrnet_params,
)
from gastx.pipeline.hrnet.transforms import (
    COCO_FLIP_PAIRS,
    box_to_center_scale,
    crop,
    flip_back,
    flip_tta_merge,
    get_affine_transform,
    preprocess_boxes,
    transform_preds,
)
from gastx.pipeline.hrnet.decode import get_final_preds, get_max_preds

__all__ = [
    "CfgNode",
    "default_config",
    "hrnet_extra",
    "update_config",
    "EXPERIMENTS",
    "experiment_config",
    "experiment_names",
    "resnet_extra",
    "fold_conv_bn",
    "hrnet_forward",
    "import_hrnet_params",
    "COCO_FLIP_PAIRS",
    "box_to_center_scale",
    "crop",
    "flip_back",
    "flip_tta_merge",
    "get_affine_transform",
    "preprocess_boxes",
    "transform_preds",
    "get_final_preds",
    "get_max_preds",
]
