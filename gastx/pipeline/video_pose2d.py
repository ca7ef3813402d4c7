"""Video -> 2D keypoints: detection, tracking, HRNet pose estimation.

Parity target: reference ``lib/pose/hrnet/pose_estimation/gen_kpts.py``:
  * ``gen_video_kpts`` (:178-275): per frame YOLO person detection -> SORT
    tracking -> keep the last ``num_person`` tracks (reversed) -> affine crops
    -> HRNet heatmaps -> decoded keypoints; accumulates (T, M, 17, 2) and
    returns (M, T, 17, 2) + scores.
  * ``gen_img_kpts`` (:115-175): single-image API.
  * ``generate_ntu_kpts_json`` (:278-358): skeleton-JSON writer.

Quirk preserved: the reference normalizes the BGR crop with the RGB-ordered
ImageNet constants and then swaps channels (gen_kpts.py:238 ``inputs[:,
[2, 1, 0]]``); the swap happens here on the channels-last axis.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class Pose2DEstimator:
    """Bundles YOLOv3 detection, SORT tracking and HRNet 2D pose."""

    def __init__(self, yolo_weights: str, hrnet_weights: str,
                 yolo_cfg: Optional[str] = None, det_dim: int = 416,
                 hrnet_width: int = 48, image_size=(288, 384),
                 confidence: float = 0.70, hrnet_spec=None,
                 flip_test: bool = False, shift_heatmap: bool = False):
        import jax

        from gastx.pipeline.hrnet import hrnet_extra, import_hrnet_params
        from gastx.pipeline.hrnet.model import hrnet_forward
        from gastx.pipeline.sort import Sort
        from gastx.pipeline.yolo import YoloHumanDetector

        self.detector = YoloHumanDetector(yolo_weights, yolo_cfg,
                                          inp_dim=det_dim,
                                          confidence=confidence)
        # hrnet_spec: explicit stage spec (EXTRA dict) overriding the
        # shipped w<width> preset — used by tests with reduced backbones.
        self.extra = hrnet_spec if hrnet_spec is not None \
            else hrnet_extra(hrnet_width)
        self.image_size = list(image_size)

        import torch
        blob = torch.load(hrnet_weights, map_location="cpu",
                          weights_only=False)
        if hasattr(blob, "state_dict"):
            blob = blob.state_dict()
        sd = {k.replace("module.", ""): v.detach().numpy()
              for k, v in blob.items()}
        self.hrnet_params = import_hrnet_params(sd, self.extra)
        extra = self.extra
        self._hrnet = jax.jit(
            lambda p, x: hrnet_forward(p, x, extra))

        # uint8-input variant: ships raw BGR crops (1/4 the bytes of the
        # normalized f32 tensor) and runs /255 + ImageNet mean/std + the
        # reference's normalize-then-BGR->RGB-swap quirk (gen_kpts.py:238)
        # in-graph. Same f32 ops as the host path.
        def _hrnet_from_u8(p, u8):
            import jax.numpy as jnp

            from gastx.pipeline.hrnet.transforms import (IMAGENET_MEAN,
                                                         IMAGENET_STD)
            x = (u8.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) \
                / IMAGENET_STD
            return hrnet_forward(p, x[..., ::-1], extra)

        self._hrnet_u8 = jax.jit(_hrnet_from_u8)
        self.tracker = Sort()
        # TEST.FLIP_TEST / TEST.SHIFT_HEATMAP heatmap flip-TTA (reference
        # lib/pose/hrnet/lib/config/default.py:101-103 + utils/
        # transforms.py:15-30): average the ordinary heatmaps with the
        # un-flipped heatmaps of the mirrored crop. Off by default, like
        # the reference's in-the-wild driver.
        self.flip_test = flip_test
        self.shift_heatmap = shift_heatmap

    def estimate_frame(self, frame: np.ndarray, num_person: int = 1,
                       track: bool = True):
        """BGR frame -> (kpts (M, 17, 2), scores (M, 17, 1)) or None."""
        crops = self.detect_crops(frame, num_person, track=track)
        if crops is None:
            return None
        return self.pose_from_crops(*crops)

    def detect_crops(self, frame: np.ndarray, num_person: int = 1,
                     track: bool = True):
        """First pipeline half: YOLO detect -> SORT track -> affine crops.

        Returns ``(inputs, centers, scales)`` ready for
        :meth:`pose_from_crops`, or None when no person survives. Split
        from :meth:`estimate_frame` so a pipelined host loop
        (gastx/cli/realtime.py) can overlap this stage's device dispatch
        with the HRNet and lifting dispatches of neighbouring frames.
        NOTE: the SORT tracker state updates here, so calls must happen
        in frame order.
        """
        bboxs, det_scores = self.detector.detect(frame)
        return self.crops_from_detections(frame, bboxs, det_scores,
                                          num_person, track)

    def crops_from_detections(self, frame, bboxs, det_scores, num_person,
                              track):
        """Host half of the detect stage: SORT update + box selection +
        affine crops, from already-computed detections.

        Public split point: the device half (``self.detector.detect``) is
        stateless and order-free, so pipelined hosts (gastx/cli/realtime.py
        pooled detect stage, :meth:`estimate_batch`) run it concurrently /
        batched and feed this ordered, tracker-owning half in frame
        order."""
        from gastx.pipeline.hrnet import preprocess_boxes

        if bboxs is None or not bboxs.any():
            return None

        if track:
            people_track = self.tracker.update(
                np.concatenate([bboxs, det_scores], axis=1))
            if people_track.shape[0] == 1:
                boxes = people_track[-1:, :-1]
            elif people_track.shape[0] >= 2:
                boxes = people_track[-num_person:, :-1][::-1]
            else:
                return None
        else:
            boxes = bboxs[:num_person]

        track_boxes = [[round(float(v), 2) for v in box] for box in boxes]
        # Raw uint8 BGR crops; normalization + the BGR->RGB-after-
        # normalization quirk run inside the _hrnet_u8 jit.
        inputs, centers, scales = preprocess_boxes(
            frame, track_boxes, self.image_size, num_person,
            normalize=False)
        return inputs, centers, scales

    def estimate_batch(self, frames, num_person: int = 1,
                       valid: Optional[int] = None):
        """Batched offline 2D: a chunk of frames -> per-frame results.

        Two device dispatches for the WHOLE chunk (three with flip-TTA):
        batched YOLO detect over the stacked letterboxes, then batched
        HRNet over every surviving crop (zero-padded to a fixed
        ``len(frames) * num_person`` so the compiled shape is stable).
        SORT updates run per frame in order between the two, exactly as
        the sequential loop. Same math as ``estimate_frame`` per frame —
        only the batch axis changes.

        ``valid`` (default all): number of leading frames that are real —
        trailing pad frames (a caller repeating the last frame to keep
        one compiled chunk shape) are detected in-batch but never touch
        the tracker or the output.

        Returns a list (``valid`` entries) of ``(preds, maxvals)`` or
        None.
        """
        from gastx.pipeline.hrnet import get_final_preds

        if valid is None:
            valid = len(frames)
        detections = self.detector.detect_batch(frames)
        crops = [self.crops_from_detections(frame, bboxs, det_scores,
                                            num_person, True)
                 for frame, (bboxs, det_scores)
                 in zip(frames[:valid], detections[:valid])]

        sizes = [0 if c is None else c[0].shape[0] for c in crops]
        total = sum(sizes)
        if total == 0:
            return [None] * valid

        batch = np.zeros((len(frames) * num_person,) +
                         next(c for c in crops if c is not None)[0].shape[1:],
                         np.uint8)
        off = 0
        for c, m in zip(crops, sizes):
            if m:
                batch[off:off + m] = c[0]
            off += m
        heatmaps = np.asarray(self._hrnet_u8(self.hrnet_params, batch))
        heatmaps = np.transpose(heatmaps, (0, 3, 1, 2))
        if self.flip_test:
            from gastx.pipeline.hrnet import COCO_FLIP_PAIRS, flip_tta_merge

            flipped = np.asarray(self._hrnet_u8(
                self.hrnet_params, batch[:, :, ::-1, :].copy()))
            heatmaps = flip_tta_merge(
                heatmaps, np.transpose(flipped, (0, 3, 1, 2)),
                COCO_FLIP_PAIRS, shift_heatmap=self.shift_heatmap)

        results, off = [], 0
        for c, m in zip(crops, sizes):
            if c is None:
                results.append(None)
                continue
            _, centers, scales = c
            preds, maxvals = get_final_preds(
                heatmaps[off:off + m], np.asarray(centers),
                np.asarray(scales))
            results.append((preds, maxvals))
            off += m
        return results

    def pose_from_crops(self, inputs, centers, scales):
        """Second pipeline half: HRNet heatmaps -> decoded keypoints.

        Stateless; takes :meth:`detect_crops` output (uint8 BGR crops)
        and returns ``(preds (M, 17, 2), maxvals (M, 17, 1))``.
        """
        from gastx.pipeline.hrnet import get_final_preds

        heatmaps = np.asarray(self._hrnet_u8(self.hrnet_params, inputs))
        heatmaps = np.transpose(heatmaps, (0, 3, 1, 2))  # NHWC -> NCHW
        if self.flip_test:
            from gastx.pipeline.hrnet import COCO_FLIP_PAIRS, flip_tta_merge

            # Same jitted forward, width-mirrored uint8 crop (NHWC axis 2;
            # mirror commutes with the per-pixel normalization).
            flipped = np.asarray(self._hrnet_u8(
                self.hrnet_params, inputs[:, :, ::-1, :].copy()))
            heatmaps = flip_tta_merge(
                heatmaps, np.transpose(flipped, (0, 3, 1, 2)),
                COCO_FLIP_PAIRS, shift_heatmap=self.shift_heatmap)
        preds, maxvals = get_final_preds(heatmaps, np.asarray(centers),
                                         np.asarray(scales))
        return preds, maxvals


def gen_video_kpts(video: str, yolo_weights: str, hrnet_weights: str,
                   det_dim: int = 416, num_person: int = 1,
                   yolo_cfg: Optional[str] = None,
                   progress: bool = True,
                   estimator: Optional[Pose2DEstimator] = None,
                   batch_size: int = 1
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the full 2D pipeline over a video. Returns ((M, T, 17, 2) kpts,
    (M, T, 17) scores). Pass ``estimator`` to reuse loaded models (or to
    inject reduced ones in tests).

    ``batch_size > 1`` switches to the batched offline mode
    (``Pose2DEstimator.estimate_batch``): YOLO runs once per
    ``batch_size``-frame chunk and HRNet once over the chunk's crops,
    instead of one dispatch each per frame — same per-frame math and
    tracker evolution, far fewer device round-trips (the chunked clip is
    padded by repeating the last frame so only one shape is compiled;
    the padding frames' detections are discarded before they reach the
    tracker).
    """
    import cv2

    if estimator is None:
        estimator = Pose2DEstimator(yolo_weights, hrnet_weights, yolo_cfg,
                                    det_dim)
    cap = cv2.VideoCapture(video)
    assert cap.isOpened(), "Cannot capture source"
    video_length = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))

    frames = range(video_length)
    if progress:
        try:
            from tqdm import tqdm
            frames = tqdm(frames)
        except ImportError:
            pass

    kpts_result: List[np.ndarray] = []
    scores_result: List[np.ndarray] = []

    def append_result(result):
        if result is None:
            return
        preds, maxvals = result
        kpts = np.zeros((num_person, 17, 2), dtype=np.float32)
        scores = np.zeros((num_person, 17), dtype=np.float32)
        kpts[:len(preds)] = preds[:num_person]
        scores[:len(maxvals)] = maxvals[:num_person, :, 0]
        kpts_result.append(kpts)
        scores_result.append(scores)

    if batch_size > 1:
        it = iter(frames)
        done = False
        while not done:
            chunk = []
            for _ in range(batch_size):
                try:
                    next(it)
                except StopIteration:
                    done = True
                    break
                ret, frame = cap.read()
                if not ret:
                    continue
                chunk.append(frame)
            if not chunk:
                continue
            real = len(chunk)
            # Repeat the last frame up to batch_size: one compiled shape.
            chunk = chunk + [chunk[-1]] * (batch_size - real)
            for result in estimator.estimate_batch(chunk, num_person,
                                                   valid=real):
                append_result(result)
    else:
        for _ in frames:
            ret, frame = cap.read()
            if not ret:
                continue
            append_result(estimator.estimate_frame(frame, num_person))
    cap.release()

    keypoints = np.array(kpts_result).transpose(1, 0, 2, 3)  # (M, T, 17, 2)
    out_scores = np.array(scores_result).transpose(1, 0, 2)  # (M, T, 17)
    return keypoints, out_scores


def gen_img_kpts(image: np.ndarray, estimator: Pose2DEstimator,
                 num_person: int = 1):
    """Single-image 2D keypoints (gen_kpts.py:115-175 equivalent)."""
    return estimator.estimate_frame(image, num_person, track=False)


def generate_kpts_json(video_path: str, kpts_file: str, yolo_weights: str,
                       hrnet_weights: str, num_person: int = 1,
                       label: str = "unknown", label_index: int = -1) -> None:
    """Write the skeleton-JSON format (gen_kpts.py:278-358 equivalent)."""
    from gastx.data.keypoints_json import save_keypoints_json

    keypoints, scores = gen_video_kpts(video_path, yolo_weights,
                                       hrnet_weights,
                                       num_person=num_person)
    save_keypoints_json(kpts_file, keypoints, scores, label, label_index)
