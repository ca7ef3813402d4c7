from gastx.data.generators import ChunkedBatcher, UnchunkedBatcher
from gastx.data.converters import (
    coco_h36m,
    mpii_h36m,
    coco_h36m_toe_format,
    openpose_to_coco,
)
from gastx.data.keypoints_json import load_keypoints_json, save_keypoints_json

__all__ = [
    "ChunkedBatcher",
    "UnchunkedBatcher",
    "coco_h36m",
    "mpii_h36m",
    "coco_h36m_toe_format",
    "openpose_to_coco",
    "load_keypoints_json",
    "save_keypoints_json",
]
