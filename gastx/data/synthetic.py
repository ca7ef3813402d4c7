"""Well-posed synthetic 2D->3D lifting task.

Single source for the convergence regression gate (tests/test_golden.py)
and the on-chip precision-tier lab (scripts/perf_lab5.py): depth is a
smooth deterministic function of the 2D pose, so the mapping is learnable
to ~0 and a <30mm held-out bar is a real update-rule regression signal —
the scaled analogue of the reference's <49.5mm H36M acceptance gate
(trainval.py:111). Keeping generator + schedule here guarantees the CI
gate and the lab's per-tier verdicts measure the same task.
"""
from __future__ import annotations

import numpy as np

# The calibrated short-training recipe behind the <30mm gate.
CONVERGENCE_STEPS = 520
CONVERGENCE_BATCH = 128
CONVERGENCE_GATE_MM = 30.0


def convergence_lr(step: int) -> float:
    """3-stage decay used by the gate (5e-3 / 1e-3 / 2e-4)."""
    return 5e-3 if step < 200 else (1e-3 if step < 360 else 2e-4)


def wellposed_batch(rng: np.random.Generator, n: int, rf: int,
                    num_joints: int = 17):
    """(n, rf, J, 2) inputs + (n, 1, J, 3) root-relative center-frame
    targets with z a fixed linear function of (x, y) per joint. (A smooth
    *nonlinear* depth converges too, just ~3x slower — measured while
    calibrating the gate — so linear keeps the CI budget small without
    weakening the regression signal.)"""
    x2d = rng.standard_normal((n, rf, num_joints, 2)).astype(np.float32) * 0.5
    j = np.arange(num_joints, dtype=np.float32)
    a, b = np.cos(0.7 * j), np.sin(1.3 * j + 0.4)
    x, y = x2d[..., 0], x2d[..., 1]
    z = 0.3 * (a * x + b * y)
    x3d = np.stack([x, y, z], axis=-1)
    x3d = x3d - x3d[:, :, :1]  # root-relative, matching the training target
    mid = rf // 2
    return x2d, x3d[:, mid:mid + 1].astype(np.float32)
