from gastx.pipeline.yolo.cfg import parse_darknet_cfg, yolov3_blocks
from gastx.pipeline.yolo.model import (
    load_darknet_weights,
    make_yolo_forward,
)
from gastx.pipeline.yolo.detect import (
    YoloHumanDetector,
    letterbox_image,
    prep_frame,
    greedy_nms,
    filter_person_detections,
    rescale_boxes,
)

__all__ = [
    "parse_darknet_cfg",
    "yolov3_blocks",
    "load_darknet_weights",
    "make_yolo_forward",
    "YoloHumanDetector",
    "letterbox_image",
    "prep_frame",
    "greedy_nms",
    "filter_person_detections",
    "rescale_boxes",
]
