"""Person detection wrapper: letterbox preprocess, confidence + NMS filter,
box rescale to original frame.

Parity targets: reference ``lib/detector/yolov3/preprocess.py:9-38``
(letterbox to 416x416, BGR->RGB, [0,1] normalize), ``util.py:107-229``
(write_results: confidence mask 0.70, xywh->xyxy, class argmax, person-class
filter, greedy IoU NMS at 0.4), and ``human_detector.py:106-157`` (rescale
from letterbox coords to the original frame + clamping).

The NMS runs vectorized on host over the handful of above-threshold person
boxes (the reference's torch loop ran per-box on device).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gastx.pipeline.sort import iou_matrix

PERSON_CLASS = 0
DEFAULT_CONFIDENCE = 0.70
DEFAULT_NMS = 0.4


def letterbox_image(img: np.ndarray, inp_dim: int) -> np.ndarray:
    """Aspect-preserving resize onto a gray (128) square canvas."""
    import cv2

    h, w = img.shape[:2]
    scale = min(inp_dim / w, inp_dim / h)
    new_w, new_h = int(w * scale), int(h * scale)
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    canvas = np.full((inp_dim, inp_dim, 3), 128, dtype=np.uint8)
    y0 = (inp_dim - new_h) // 2
    x0 = (inp_dim - new_w) // 2
    canvas[y0:y0 + new_h, x0:x0 + new_w] = resized
    return canvas


def prep_frame(img: np.ndarray, inp_dim: int) -> np.ndarray:
    """BGR frame -> (1, inp_dim, inp_dim, 3) float32 RGB in [0, 1] (NHWC)."""
    canvas = letterbox_image(img, inp_dim)
    rgb = canvas[:, :, ::-1].astype(np.float32) / 255.0
    return rgb[None]


def greedy_nms(boxes: np.ndarray, scores: np.ndarray,
               threshold: float) -> np.ndarray:
    """Indices kept by descending-score greedy IoU suppression."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = iou_matrix(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][ious < threshold]
    return np.array(keep, dtype=int)


def filter_person_detections(
    raw: np.ndarray,
    confidence: float = DEFAULT_CONFIDENCE,
    nms_threshold: float = DEFAULT_NMS,
) -> Optional[np.ndarray]:
    """(N, 85) decoded predictions -> (M, 6) [x1 y1 x2 y2 obj cls_score]
    for the person class, NMS-suppressed. None when nothing passes."""
    raw = np.asarray(raw)
    mask = raw[:, 4] > confidence
    if not mask.any():
        return None
    pred = raw[mask]

    boxes = np.empty((pred.shape[0], 4), np.float32)
    boxes[:, 0] = pred[:, 0] - pred[:, 2] / 2
    boxes[:, 1] = pred[:, 1] - pred[:, 3] / 2
    boxes[:, 2] = pred[:, 0] + pred[:, 2] / 2
    boxes[:, 3] = pred[:, 1] + pred[:, 3] / 2

    cls_idx = np.argmax(pred[:, 5:], axis=1)
    cls_score = pred[np.arange(len(pred)), 5 + cls_idx]
    person = cls_idx == PERSON_CLASS
    if not person.any():
        return None
    boxes, obj, cls_score = boxes[person], pred[person, 4], cls_score[person]

    keep = greedy_nms(boxes, obj, nms_threshold)
    return np.concatenate([boxes[keep], obj[keep, None],
                           cls_score[keep, None]], axis=1)


def rescale_boxes(dets: np.ndarray, inp_dim: int, orig_w: int,
                  orig_h: int) -> np.ndarray:
    """Undo the letterbox transform and clamp to the frame."""
    dets = dets.copy()
    scale = min(inp_dim / orig_w, inp_dim / orig_h)
    dets[:, [0, 2]] -= (inp_dim - scale * orig_w) / 2
    dets[:, [1, 3]] -= (inp_dim - scale * orig_h) / 2
    dets[:, :4] /= scale
    dets[:, [0, 2]] = np.clip(dets[:, [0, 2]], 0.0, orig_w)
    dets[:, [1, 3]] = np.clip(dets[:, [1, 3]], 0.0, orig_h)
    return dets


class YoloHumanDetector:
    """Loads weights once; ``detect(frame)`` -> (bboxs (M,4), scores (M,1))."""

    def __init__(self, weight_file: str, cfg_file: Optional[str] = None,
                 inp_dim: int = 416, confidence: float = DEFAULT_CONFIDENCE,
                 nms_threshold: float = DEFAULT_NMS):
        import jax

        from gastx.pipeline.yolo.cfg import parse_darknet_cfg, yolov3_blocks
        from gastx.pipeline.yolo.model import (load_darknet_weights,
                                               make_yolo_forward)

        assert inp_dim % 32 == 0 and inp_dim > 32
        self.inp_dim = inp_dim
        self.confidence = confidence
        self.nms_threshold = nms_threshold
        self.blocks = (parse_darknet_cfg(cfg_file) if cfg_file
                       else yolov3_blocks(inp_dim, inp_dim))
        self.params = load_darknet_weights(weight_file, self.blocks)
        self._yolo_fwd = make_yolo_forward(self.blocks, inp_dim)
        self._forward = jax.jit(self._yolo_fwd)
        # Single-dispatch detect: uint8 letterbox in, pre-filtered person
        # candidates out. The host<->device payload drops from 2 MB f32 up
        # + 3.6 MB raw predictions down (the measured per-frame cost on
        # tunnelled hosts) to 0.5 MB up + ~0.3 MB down; the math is the
        # same IEEE f32 ops filter_person_detections runs (x*0.5 is
        # exact, so fusion cannot change the boxes bitwise).
        self._detect_dev = jax.jit(self._device_detect)
        self._detect_dev_batch = jax.jit(self._device_detect_batch)

    def _device_filter(self, raw):
        """(..., N, 85) decoded predictions -> (..., N, 7) f32
        [x1 y1 x2 y2 obj cls_score person_keep]; the in-graph half of
        filter_person_detections (same IEEE f32 ops)."""
        import jax.numpy as jnp

        obj = raw[..., 4]
        cls = raw[..., 5:]
        cls_idx = jnp.argmax(cls, axis=-1)
        cls_score = jnp.take_along_axis(cls, cls_idx[..., None],
                                        axis=-1)[..., 0]
        keep = (obj > self.confidence) & (cls_idx == PERSON_CLASS)
        half_w, half_h = raw[..., 2] * 0.5, raw[..., 3] * 0.5
        boxes = jnp.stack([raw[..., 0] - half_w, raw[..., 1] - half_h,
                           raw[..., 0] + half_w, raw[..., 1] + half_h],
                          axis=-1)
        return jnp.concatenate(
            [boxes, obj[..., None], cls_score[..., None],
             keep[..., None].astype(jnp.float32)], axis=-1)

    def _device_detect(self, params, canvas_u8):
        """(inp, inp, 3) BGR uint8 letterbox -> (N, 7)."""
        import jax.numpy as jnp

        x = canvas_u8[..., ::-1].astype(jnp.float32) / 255.0
        return self._device_filter(self._yolo_fwd(params, x[None])[0])

    def _device_detect_batch(self, params, canvases_u8):
        """(B, inp, inp, 3) BGR uint8 letterboxes -> (B, N, 7)."""
        import jax.numpy as jnp

        x = canvases_u8[..., ::-1].astype(jnp.float32) / 255.0
        return self._device_filter(self._yolo_fwd(params, x))

    def _host_filter(self, out, w: int, h: int):
        """(N, 7) device output -> detect()'s (bboxs, scores) contract."""
        rows = out[out[:, 6] > 0.5]
        if rows.shape[0] == 0:
            return None, None
        keep = greedy_nms(rows[:, :4], rows[:, 4], self.nms_threshold)
        dets = rescale_boxes(rows[keep][:, :6], self.inp_dim, w, h)
        bboxs = np.round(dets[:, :4].astype(np.float64), 2)
        scores = dets[:, 4:5]
        return bboxs, scores

    def detect(self, frame: np.ndarray
               ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """``frame``: BGR uint8 (H, W, 3). Mirrors yolo_human_det's
        (bboxs, scores) contract (human_detector.py:106-157)."""
        h, w = frame.shape[:2]
        canvas = letterbox_image(frame, self.inp_dim)
        out = np.asarray(self._detect_dev(self.params, canvas))
        return self._host_filter(out, w, h)

    def detect_batch(self, frames):
        """Batched detect over a chunk of frames — ONE device dispatch
        for the whole chunk (offline throughput mode; amortizes the
        per-dispatch cost the per-frame realtime loop pays per frame).
        Returns a list of per-frame ``detect()`` results.
        """
        canvases = np.stack([letterbox_image(f, self.inp_dim)
                             for f in frames])
        out = np.asarray(self._detect_dev_batch(self.params, canvases))
        return [self._host_filter(out[b], f.shape[1], f.shape[0])
                for b, f in enumerate(frames)]
