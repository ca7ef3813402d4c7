"""Geometry parity tests: quaternions, camera transforms, H36M projection."""
import numpy as np
import pytest

from gastx.geometry import (
    camera_to_world,
    image_coordinates,
    normalize_screen_coordinates,
    project_to_2d,
    qinverse,
    qrot,
    world_to_camera,
)

from reference_torch import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _unit_quats(rng, shape):
    q = rng.standard_normal(shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qrot_identity():
    v = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    q = np.array([[1.0, 0.0, 0.0, 0.0]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(qrot(q, v)), v, atol=1e-6)


def test_qrot_90deg_z():
    # 90 degrees about z: x -> y
    s = np.sqrt(0.5, dtype=np.float32)
    q = np.array([[s, 0.0, 0.0, s]], dtype=np.float32)
    v = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(qrot(q, v)),
                               [[0.0, 1.0, 0.0]], atol=1e-6)


def test_qinverse_roundtrip():
    rng = np.random.default_rng(0)
    q = _unit_quats(rng, (32,))
    v = rng.standard_normal((32, 3)).astype(np.float32)
    back = qrot(qinverse(q), np.asarray(qrot(q, v)))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_world_camera_roundtrip():
    rng = np.random.default_rng(1)
    q = _unit_quats(rng, ())
    t = rng.standard_normal(3).astype(np.float32)
    x = rng.standard_normal((7, 5, 3)).astype(np.float32)
    cam = world_to_camera(x, q, t)
    back = camera_to_world(np.asarray(cam), q, t)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_screen_coordinate_roundtrip():
    rng = np.random.default_rng(2)
    x = (rng.random((11, 17, 2)) * [1000, 1002]).astype(np.float32)
    n = normalize_screen_coordinates(x, w=1000, h=1002)
    back = image_coordinates(np.asarray(n), w=1000, h=1002)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-3)
    # [0, w] -> [-1, 1] exactly
    corners = np.array([[0.0, 0.0], [1000.0, 1002.0]], dtype=np.float32)
    n = np.asarray(normalize_screen_coordinates(corners, w=1000, h=1002))
    np.testing.assert_allclose(n[0], [-1.0, -1.002], atol=1e-6)
    np.testing.assert_allclose(n[1], [1.0, 1.002], atol=1e-5)


@requires_reference
def test_qrot_matches_reference():
    import torch
    from reference_torch import import_reference
    import_reference()
    from common.quaternion import qort as ref_qort

    rng = np.random.default_rng(3)
    q = _unit_quats(rng, (64,))
    v = rng.standard_normal((64, 3)).astype(np.float32)
    ref = ref_qort(torch.from_numpy(q), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(np.asarray(qrot(q, v)), ref, atol=1e-6)


@requires_reference
def test_project_to_2d_matches_reference():
    import torch
    from reference_torch import import_reference
    import_reference()
    from common.camera import project_to_2d as ref_project

    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 10, 17, 3)).astype(np.float32)
    x[..., 2] += 5.0  # keep points in front of the camera
    cams = rng.standard_normal((4, 9)).astype(np.float32) * 0.1
    cams[:, :2] += 1.0  # focal lengths near 1

    ref = ref_project(torch.from_numpy(x), torch.from_numpy(cams)).numpy()
    got = np.asarray(project_to_2d(x, cams))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@requires_reference
def test_world_to_camera_matches_reference():
    from reference_torch import import_reference
    import_reference()
    from common.camera import world_to_camera as ref_w2c, camera_to_world as ref_c2w

    rng = np.random.default_rng(5)
    q = _unit_quats(rng, ())
    t = rng.standard_normal(3).astype(np.float32)
    x = rng.standard_normal((6, 17, 3)).astype(np.float32)

    np.testing.assert_allclose(np.asarray(world_to_camera(x, q, t)),
                               ref_w2c(x, R=q, t=t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(camera_to_world(x, q, t)),
                               ref_c2w(x, R=q, t=t), atol=1e-5)
