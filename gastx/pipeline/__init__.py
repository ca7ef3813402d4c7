from gastx.pipeline.sort import Sort, KalmanBoxTracker, iou_matrix
from gastx.pipeline.keypoint_revision import (
    h36m_coco_format,
    revise_kpts,
    revise_skes,
    revise_skes_real_time,
)

__all__ = [
    "Sort",
    "KalmanBoxTracker",
    "iou_matrix",
    "h36m_coco_format",
    "revise_kpts",
    "revise_skes",
    "revise_skes_real_time",
]
