"""Keypoint-format converter parity (COCO / MPII / wholebody -> H36M)."""
import numpy as np
import pytest

from gastx.data.converters import coco_h36m, coco_h36m_toe_format, mpii_h36m

from reference_torch import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _ref_converters():
    from reference_torch import import_reference
    import_reference()
    from tools import mpii_coco_h36m as ref
    return ref


def test_valid_frames_skips_zero_frames():
    kpts = np.random.default_rng(0).random((5, 17, 2)).astype(np.float32) + 1
    kpts[2] = 0.0
    _, valid = coco_h36m(kpts)
    # frame 2 contributes all-zero inputs -> synthesized joints are zero too
    assert 2 not in valid


@requires_reference
def test_coco_h36m_matches_reference():
    ref = _ref_converters()
    rng = np.random.default_rng(1)
    kpts = (rng.random((40, 17, 2)) * 640).astype(np.float32)
    ref_out, ref_valid = ref.coco_h36m(kpts.copy())
    got_out, got_valid = coco_h36m(kpts.copy())
    np.testing.assert_allclose(got_out, ref_out, atol=1e-4)
    np.testing.assert_array_equal(got_valid, ref_valid)


@requires_reference
def test_mpii_h36m_matches_reference():
    ref = _ref_converters()
    rng = np.random.default_rng(2)
    kpts = (rng.random((25, 16, 2)) * 640).astype(np.float32)
    ref_out, ref_valid = ref.mpii_h36m(kpts.copy())
    got_out, got_valid = mpii_h36m(kpts.copy())
    np.testing.assert_allclose(got_out, ref_out, atol=1e-4)
    np.testing.assert_array_equal(got_valid, ref_valid)


@requires_reference
def test_coco_h36m_toe_format_matches_reference():
    ref = _ref_converters()
    rng = np.random.default_rng(3)
    kpts = (rng.random((18, 23, 2)) * 640).astype(np.float32)
    ref_out, ref_valid = ref.coco_h36m_toe_format(kpts.copy())
    got_out, got_valid = coco_h36m_toe_format(kpts.copy())
    np.testing.assert_allclose(got_out, ref_out, atol=1e-4)
    np.testing.assert_array_equal(got_valid, ref_valid)
