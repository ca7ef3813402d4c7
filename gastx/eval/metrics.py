"""Pose-error metrics.

Parity target: reference ``common/loss.py``:
  * ``mpjpe``        — Protocol #1, mean per-joint L2 (common/loss.py:5-11)
  * ``p_mpjpe``      — Protocol #2, Procrustes-aligned MPJPE (common/loss.py:14-53)
  * ``euclidean_losses`` / ``pck`` / ``auc`` — MPI-INF-3DHP-style extras
    (common/loss.py:56-90)

``mpjpe`` (the training loss) is jax.numpy and jit/grad-compatible. The
Procrustes alignment (``p_mpjpe``) and threshold metrics (``pck``/``auc``)
are eval-only host-side numpy, matching the reference's design — and
deliberately float64: batched fp32 SVD on accelerator backends is far too
loose for a sub-0.1mm parity budget.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error (Protocol #1)."""
    assert predicted.shape == target.shape
    return jnp.mean(jnp.linalg.norm(predicted - target, axis=-1))


def weighted_mpjpe(predicted, target, w):
    """Per-joint weighted MPJPE (for ablations)."""
    assert predicted.shape == target.shape
    return jnp.mean(w * jnp.linalg.norm(predicted - target, axis=-1))


def p_mpjpe(predicted, target) -> float:
    """MPJPE after rigid alignment (scale + rotation + translation), Protocol #2.

    ``predicted``/``target``: (B, J, 3) host arrays. Follows the SVD recipe of
    common/loss.py:14-53 including the det-sign reflection fix.
    """
    predicted = np.asarray(predicted)
    target = np.asarray(target)
    assert predicted.shape == target.shape

    muX = np.mean(target, axis=1, keepdims=True)
    muY = np.mean(predicted, axis=1, keepdims=True)

    X0 = target - muX
    Y0 = predicted - muY

    normX = np.sqrt(np.sum(X0**2, axis=(1, 2), keepdims=True))
    normY = np.sqrt(np.sum(Y0**2, axis=(1, 2), keepdims=True))

    X0 = X0 / normX
    Y0 = Y0 / normY

    H = np.matmul(np.swapaxes(X0, 1, 2), Y0)
    U, s, Vt = np.linalg.svd(H)
    V = np.swapaxes(Vt, 1, 2)
    R = np.matmul(V, np.swapaxes(U, 1, 2))

    # Fix improper rotations (reflections).
    sign_detR = np.sign(np.expand_dims(np.linalg.det(R), axis=1))
    V[:, :, -1] *= sign_detR
    s[:, -1] *= sign_detR.flatten()
    R = np.matmul(V, np.swapaxes(U, 1, 2))

    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)

    a = tr * normX / normY                       # scale
    t = muX - a * np.matmul(muY, R)              # translation

    predicted_aligned = a * np.matmul(predicted, R) + t
    return float(np.mean(np.linalg.norm(predicted_aligned - target, axis=-1)))


def n_mpjpe(predicted, target):
    """MPJPE after optimal scaling only (Protocol #1 variant)."""
    assert predicted.shape == target.shape
    norm_predicted = jnp.mean(jnp.sum(predicted**2, axis=3, keepdims=True),
                              axis=2, keepdims=True)
    norm_target = jnp.mean(jnp.sum(target * predicted, axis=3, keepdims=True),
                           axis=2, keepdims=True)
    scale = norm_target / norm_predicted
    return mpjpe(scale * predicted, target)


def euclidean_losses(actual, target):
    """Per-point Euclidean distances, (B, J) (common/loss.py:56-74)."""
    actual = np.asarray(actual)
    target = np.asarray(target)
    assert actual.shape == target.shape
    return np.sqrt(np.sum((actual - target) ** 2, axis=-1))


def pck(actual, expected, threshold: float = 150.0) -> float:
    """Percentage of correct keypoints under ``threshold`` (common/loss.py:77-79)."""
    dists = euclidean_losses(actual, expected)
    return float(np.mean((dists < threshold).astype(np.float64)))


def auc(actual, expected) -> float:
    """Mean PCK over thresholds 0..150 in 31 steps (common/loss.py:82-90)."""
    thresholds = np.linspace(0.0, 150.0, 31)
    return float(np.mean([pck(actual, expected, t) for t in thresholds]))
