"""Bounding-box -> model-input affine crops and their inverses.

Parity targets: reference ``lib/pose/hrnet/lib/utils/transforms.py:58-122``
(get_affine_transform / affine_transform / transform_preds / crop) and
``lib/pose/hrnet/lib/utils/utilitys.py:103-170`` (box_to_center_scale with
1.25x padding and pixel_std 200; PreProcess warp + ImageNet normalization).

Note: the reference's PreProcess passes the *image* height/width as the
"model" dimensions into box_to_center_scale (utilitys.py:152) — so the crop
aspect ratio follows the frame, not the network input. That call-site
behavior is preserved here because lifted outputs must match.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PIXEL_STD = 200.0


# COCO 17-keypoint left/right pairs (eyes, ears, shoulders, elbows,
# wrists, hips, knees, ankles) — the matched_parts argument of flip_back
# for the shipped COCO-trained HRNet backbones.
COCO_FLIP_PAIRS: Tuple[Tuple[int, int], ...] = (
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16))


def flip_back(output_flipped: np.ndarray, matched_parts) -> np.ndarray:
    """Un-flip heatmaps predicted from a horizontally flipped input.

    ``output_flipped``: (N, J, H, W) heatmaps from the flipped image;
    returns them reversed along W with left/right joint channels swapped.
    Parity target: reference ``lib/pose/hrnet/lib/utils/transforms.py:15-30``
    (its per-pair copy loop becomes one joint-permutation gather).
    """
    assert output_flipped.ndim == 4, \
        "output_flipped should be [batch_size, num_joints, height, width]"
    perm = np.arange(output_flipped.shape[1])
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return output_flipped[:, perm, :, ::-1]


def flip_tta_merge(heatmaps: np.ndarray, heatmaps_flipped: np.ndarray,
                   matched_parts, shift_heatmap: bool = False) -> np.ndarray:
    """Average ordinary and flipped-input heatmaps (TEST.FLIP_TEST).

    The standard HRNet heatmap flip-TTA (config keys TEST.FLIP_TEST /
    TEST.SHIFT_HEATMAP, reference ``lib/pose/hrnet/lib/config/
    default.py:101-103``): un-flip the flipped prediction, optionally
    shift it right one heatmap column (compensates the half-pixel
    misalignment of flipping an even-width feature map), and average.
    """
    out_f = flip_back(np.asarray(heatmaps_flipped), matched_parts)
    if shift_heatmap:
        out_f = out_f.copy()
        out_f[:, :, :, 1:] = out_f[:, :, :, :-1]
    return (np.asarray(heatmaps) + out_f) * 0.5


def get_3rd_point(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def get_dir(src_point, rot_rad: float):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return [src_point[0] * cs - src_point[1] * sn,
            src_point[0] * sn + src_point[1] * cs]


def get_affine_transform(center, scale, rot, output_size,
                         shift=np.array([0, 0], dtype=np.float32),
                         inv: bool = False) -> np.ndarray:
    """2x3 affine mapping the scaled box onto the model input canvas."""
    import cv2

    scale = np.array(scale) if not isinstance(scale, np.ndarray) else scale
    if scale.ndim == 0:
        scale = np.array([scale, scale])

    scale_tmp = scale * PIXEL_STD
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180
    src_dir = get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2, :] = get_3rd_point(src[0], src[1])
    dst[2, :] = get_3rd_point(dst[0], dst[1])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def affine_transform(pt, t: np.ndarray) -> np.ndarray:
    new_pt = np.array([pt[0], pt[1], 1.0])
    return (t @ new_pt)[:2]


def transform_preds(coords: np.ndarray, center, scale,
                    output_size) -> np.ndarray:
    """Heatmap coords -> original image coords via the inverse affine."""
    target = coords.copy()
    trans = get_affine_transform(center, scale, 0, output_size, inv=True)
    for p in range(coords.shape[0]):
        target[p, 0:2] = affine_transform(coords[p, 0:2], trans)
    return target


def crop(img: np.ndarray, center, scale, output_size,
         rot: float = 0) -> np.ndarray:
    import cv2

    trans = get_affine_transform(center, scale, rot, output_size)
    return cv2.warpAffine(img, trans,
                          (int(output_size[0]), int(output_size[1])),
                          flags=cv2.INTER_LINEAR)


def box_to_center_scale(box, model_image_width: int,
                        model_image_height: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """xyxy box -> (center, scale) with 1.25x padding (utilitys.py:103-136)."""
    center = np.zeros(2, dtype=np.float32)
    x1, y1, x2, y2 = box[:4]
    box_width, box_height = x2 - x1, y2 - y1
    center[0] = x1 + box_width * 0.5
    center[1] = y1 + box_height * 0.5

    aspect_ratio = model_image_width * 1.0 / model_image_height
    if box_width > aspect_ratio * box_height:
        box_height = box_width * 1.0 / aspect_ratio
    elif box_width < aspect_ratio * box_height:
        box_width = box_height * aspect_ratio
    scale = np.array([box_width / PIXEL_STD, box_height / PIXEL_STD],
                     dtype=np.float32)
    if center[0] != -1:
        scale = scale * 1.25
    return center, scale


def preprocess_boxes(image: np.ndarray, bboxs: Sequence, image_size,
                     num_pos: int = 2, normalize: bool = True
                     ) -> Tuple[np.ndarray, List, List]:
    """Warp per-box crops to the model input and ImageNet-normalize.

    Returns (inputs (M, H, W, 3) NHWC float32, centers, scales). Mirrors
    PreProcess (utilitys.py:140-170) including its image-dims-as-model-dims
    call into box_to_center_scale.

    ``normalize=False`` returns the raw uint8 crops instead: the
    /255 + ImageNet mean/std affine then runs inside the HRNet jit
    (gastx/pipeline/video_pose2d.py), so only a quarter of the bytes
    cross the host->device boundary per crop.
    """
    import cv2

    inputs, centers, scales = [], [], []
    for bbox in bboxs[:num_pos]:
        c, s = box_to_center_scale(bbox, image.shape[0], image.shape[1])
        centers.append(c)
        scales.append(s)
        trans = get_affine_transform(c, s, 0, image_size)
        patch = cv2.warpAffine(image, trans,
                               (int(image_size[0]), int(image_size[1])),
                               flags=cv2.INTER_LINEAR)
        if normalize:
            patch = patch.astype(np.float32) / 255.0
            patch = (patch - IMAGENET_MEAN) / IMAGENET_STD
        inputs.append(patch)
    return np.stack(inputs), centers, scales
