"""Camera model: screen-coordinate normalization, world<->camera transforms and
the full Human3.6M projection (radial + tangential distortion).

Parity target: reference ``common/camera.py:8-62``, rebuilt in jax.numpy so the
projection is jit/grad-compatible (the reference used torch for the same
reason; here everything lives in one array library).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gastx.geometry.quaternion import qinverse, qrot


def normalize_screen_coordinates(X, w, h):
    """Map pixel coords so that [0, w] -> [-1, 1], preserving aspect ratio.

    Reference: common/camera.py:8-12. Host-side numpy inputs stay numpy:
    these run in per-frame host loops (realtime CLI), where a device
    dispatch would cost ~30 ms of tunnel RTT for a 17x2 array
    (scripts/perf_lab9.py stage attribution).
    """
    assert X.shape[-1] == 2
    if isinstance(X, np.ndarray):
        return X / w * 2.0 - np.asarray([1.0, h / w], dtype=X.dtype)
    X = jnp.asarray(X)
    return X / w * 2.0 - jnp.asarray([1.0, h / w], dtype=X.dtype)


def image_coordinates(X, w, h):
    """Inverse of :func:`normalize_screen_coordinates` (common/camera.py:15-19)."""
    assert X.shape[-1] == 2
    if isinstance(X, np.ndarray):
        return (X + np.asarray([1.0, h / w], dtype=X.dtype)) * w / 2.0
    X = jnp.asarray(X)
    return (X + jnp.asarray([1.0, h / w], dtype=X.dtype)) * w / 2.0


def world_to_camera(X, R, t):
    """Rotate+translate world points into camera frame (common/camera.py:22-24).

    ``R`` is the camera->world unit quaternion (4,), ``t`` the world translation.
    """
    X = jnp.asarray(X)
    Rt = qinverse(jnp.asarray(R))
    Rt = jnp.broadcast_to(Rt, X.shape[:-1] + (4,))
    return qrot(Rt, X - jnp.asarray(t))


def camera_to_world(X, R, t):
    """Inverse of :func:`world_to_camera` (common/camera.py:27-28)."""
    X = jnp.asarray(X)
    R = jnp.broadcast_to(jnp.asarray(R), X.shape[:-1] + (4,))
    return qrot(R, X) + jnp.asarray(t)


def project_to_2d(X, camera_params):
    """Project camera-space 3D points to 2D with the H36M distortion model.

    ``X``: (N, ..., 3) camera-space points; ``camera_params``: (N, 9) intrinsics
    laid out ``[fx, fy, cx, cy, k1, k2, k3, p1, p2]``.
    Reference: common/camera.py:31-62.
    """
    X = jnp.asarray(X)
    camera_params = jnp.asarray(camera_params)
    assert X.shape[-1] == 3
    assert camera_params.ndim == 2 and camera_params.shape[-1] == 9
    assert X.shape[0] == camera_params.shape[0]

    while camera_params.ndim < X.ndim:
        camera_params = camera_params[:, None]

    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    k = camera_params[..., 4:7]
    p = camera_params[..., 7:]

    XX = X[..., :2] / X[..., 2:]
    r2 = jnp.sum(XX**2, axis=-1, keepdims=True)

    radial = 1 + jnp.sum(
        k * jnp.concatenate([r2, r2**2, r2**3], axis=-1), axis=-1, keepdims=True
    )
    tan = jnp.sum(p * XX, axis=-1, keepdims=True)

    XXX = XX * (radial + tan) + p * r2
    return f * XXX + c
