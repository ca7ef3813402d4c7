"""Protocol evaluation: MPJPE (P1) / P-MPJPE (P2), frame-weighted,
action-wise.

Parity target: reference ``main.py:299-353`` (evaluate) and
``trainval.py:304-337`` (run_evaluation): per-sequence eval-mode forward with
optional test-time flip averaging, frame-weighted accumulation, errors
reported in millimeters.

TPU-first: predictions come from :func:`gastx.infer.lifting.lift_sequences`
(length-bucketed batched jit calls with the TTA flip fused in) instead of a
per-sequence batch-2 python loop; error reduction happens on host in numpy.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gastx.eval.metrics import p_mpjpe as p_mpjpe_np
from gastx.infer.lifting import lift_sequences
from gastx.models.config import GastNetConfig


def evaluate_sequences(
    params,
    state,
    poses_2d: Sequence[np.ndarray],
    poses_3d: Sequence[np.ndarray],
    cfg: GastNetConfig,
    *,
    tta: bool = True,
    compute_p2: bool = True,
    kps_lr=None,
) -> Tuple[float, float]:
    """Returns (MPJPE, P-MPJPE) in mm over the given sequences.

    ``kps_lr``: the 2D detections' (kps_left, kps_right) symmetry for the
    TTA input flip (see lift_sequences) — required for detections whose
    joint order differs from the 3D layout (sh_ft_h36m)."""
    preds = lift_sequences(params, state, poses_2d, cfg, tta=tta,
                           kps_lr=kps_lr)

    e1_sum = 0.0
    e2_sum = 0.0
    n = 0
    for pred, target in zip(preds, poses_3d):
        target = np.array(target, dtype=np.float32)
        target[:, 0] = 0.0  # root-relative (main.py:330)
        frames = target.shape[0]
        e1_sum += frames * float(np.mean(
            np.linalg.norm(pred - target, axis=-1)))
        if compute_p2:
            e2_sum += frames * p_mpjpe_np(pred, target)
        n += frames

    e1 = e1_sum / n * 1000.0
    e2 = (e2_sum / n * 1000.0) if compute_p2 else float("nan")
    return e1, e2


def run_evaluation(
    params,
    state,
    all_actions: Dict[str, list],
    dataset,
    keypoints: Dict,
    cfg: GastNetConfig,
    *,
    downsample: int = 5,
    tta: bool = True,
    action_filter: Optional[Sequence[str]] = None,
    log=print,
    kps_lr=None,
) -> Tuple[float, float]:
    """Action-wise protocol run; prints per-action and average P1/P2 in mm."""
    from gastx.data.harness import fetch_actions

    errors_p1: List[float] = []
    errors_p2: List[float] = []
    for action_key in all_actions.keys():
        if action_filter is not None and not any(
                action_key.startswith(a) for a in action_filter):
            continue
        poses_act, poses_2d_act = fetch_actions(
            all_actions[action_key], dataset, keypoints, downsample)
        e1, e2 = evaluate_sequences(params, state, poses_2d_act, poses_act,
                                    cfg, tta=tta, kps_lr=kps_lr)
        log(f"----{action_key}----")
        log(f"Test time augmentation: {tta}")
        log(f"Protocol #1 Error (MPJPE): {e1} mm")
        log(f"Protocol #2 Error (P-MPJPE): {e2} mm")
        log("----------")
        errors_p1.append(e1)
        errors_p2.append(e2)

    p1 = float(np.mean(errors_p1))
    p2 = float(np.mean(errors_p2))
    log(f"Protocol #1   (MPJPE) action-wise average: {round(p1, 1)} mm")
    log(f"Protocol #2 (P-MPJPE) action-wise average: {round(p2, 1)} mm")
    return p1, p2
