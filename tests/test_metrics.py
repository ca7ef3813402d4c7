"""Metric parity tests (mpjpe / p_mpjpe / pck / auc)."""
import numpy as np
import pytest

from gastx.eval import auc, mpjpe, p_mpjpe, pck

from reference_torch import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def test_mpjpe_zero_for_identical():
    x = np.random.default_rng(0).standard_normal((4, 17, 3)).astype(np.float32)
    assert float(mpjpe(x, x)) == 0.0


def test_mpjpe_known_value():
    a = np.zeros((1, 2, 3), dtype=np.float32)
    b = np.zeros((1, 2, 3), dtype=np.float32)
    b[0, 0, 0] = 3.0
    b[0, 1, 1] = 4.0
    assert float(mpjpe(a, b)) == pytest.approx(3.5)


def test_p_mpjpe_invariant_to_rigid_transform():
    rng = np.random.default_rng(1)
    target = rng.standard_normal((6, 17, 3)).astype(np.float32)
    # random rotation + scale + translation of the target
    q = rng.standard_normal(4).astype(np.float32)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)
    pred = 1.7 * target @ rot.T + np.float32([0.3, -0.5, 2.0])
    assert float(p_mpjpe(pred, target)) < 1e-4


@requires_reference
def test_mpjpe_matches_reference():
    import torch
    from reference_torch import import_reference
    import_reference()
    from common.loss import mpjpe as ref_mpjpe

    rng = np.random.default_rng(2)
    a = rng.standard_normal((8, 27, 17, 3)).astype(np.float32)
    b = rng.standard_normal((8, 27, 17, 3)).astype(np.float32)
    ref = float(ref_mpjpe(torch.from_numpy(a), torch.from_numpy(b)))
    assert float(mpjpe(a, b)) == pytest.approx(ref, abs=1e-6)


@requires_reference
def test_p_mpjpe_matches_reference():
    from reference_torch import import_reference
    import_reference()
    from common.loss import p_mpjpe as ref_p_mpjpe

    rng = np.random.default_rng(3)
    a = rng.standard_normal((16, 17, 3)).astype(np.float32)
    b = a + 0.05 * rng.standard_normal((16, 17, 3)).astype(np.float32)
    ref = float(ref_p_mpjpe(a, b))
    assert float(p_mpjpe(a, b)) == pytest.approx(ref, abs=1e-5)


@requires_reference
def test_pck_auc_match_reference():
    import torch
    from reference_torch import import_reference
    import_reference()
    from common.loss import pck as ref_pck, auc as ref_auc

    rng = np.random.default_rng(4)
    a = rng.standard_normal((32, 16, 3)).astype(np.float64) * 100
    b = a + rng.standard_normal((32, 16, 3)) * 60
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    assert float(pck(a, b)) == pytest.approx(ref_pck(ta, tb), abs=1e-9)
    assert float(auc(a, b)) == pytest.approx(ref_auc(ta, tb), abs=1e-9)
