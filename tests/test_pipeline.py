"""In-the-wild pipeline tests: SORT tracking behavior and keypoint
revision parity vs the reference preprocess tools."""
import numpy as np
import pytest

from gastx.pipeline import (
    Sort,
    h36m_coco_format,
    iou_matrix,
    revise_kpts,
    revise_skes,
)

from reference_torch import import_reference, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _moving_box(t, x0=100.0, speed=5.0):
    x = x0 + speed * t
    return [x, 50.0, x + 60.0, 170.0, 0.95]


def test_sort_tracks_moving_box():
    tracker = Sort(max_age=1, min_hits=3)
    ids = []
    for t in range(10):
        out = tracker.update(np.array([_moving_box(t)]))
        if len(out):
            ids.append(int(out[0, 4]))
    # One stable track id throughout
    assert len(set(ids)) == 1
    # Predicted box tracks the motion
    out = tracker.update(np.array([_moving_box(10)]))
    assert abs(out[0, 0] - 150.0) < 10.0


def test_sort_two_people_stable_ids():
    from gastx.pipeline import KalmanBoxTracker
    KalmanBoxTracker.count = 0  # ids are globally sequential, as upstream
    tracker = Sort(max_age=1, min_hits=3)
    for t in range(8):
        dets = np.array([_moving_box(t, x0=100.0),
                         _moving_box(t, x0=400.0, speed=-3.0)])
        out = tracker.update(dets)
    assert out.shape[0] == 2
    assert set(out[:, 4].astype(int)) == {1, 2}


def test_sort_drops_stale_tracks():
    tracker = Sort(max_age=1, min_hits=1)
    tracker.update(np.array([_moving_box(0)]))
    tracker.update(np.array([_moving_box(1)]))
    assert len(tracker.trackers) == 1
    # two consecutive empty frames exceed max_age
    tracker.update(np.empty((0, 5)))
    tracker.update(np.empty((0, 5)))
    assert len(tracker.trackers) == 0


def test_iou_matrix_values():
    a = np.array([[0, 0, 10, 10]], dtype=np.float32)
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]],
                 dtype=np.float32)
    ious = iou_matrix(a, b)[0]
    np.testing.assert_allclose(ious, [1.0, 50 / 150, 0.0], atol=1e-6)


def _fake_detections(rng, num_person=2, t=30):
    kpts = (rng.random((num_person, t, 17, 2)) * 640 + 1).astype(np.float32)
    scores = rng.random((num_person, t, 17)).astype(np.float32) * 0.6 + 0.35
    # drop some leg-joint confidences below threshold
    scores[0, 3, [2, 5]] = 0.1
    scores[1, 7, [3, 6]] = 0.05
    return kpts, scores


@requires_reference
def test_h36m_coco_format_matches_reference():
    import_reference()
    from tools.preprocess import h36m_coco_format as ref_fmt

    rng = np.random.default_rng(0)
    kpts, scores = _fake_detections(rng)
    ref_k, ref_s, ref_v = ref_fmt(kpts.copy(), scores.copy())
    got_k, got_s, got_v = h36m_coco_format(kpts.copy(), scores.copy())
    np.testing.assert_allclose(got_k, ref_k, atol=1e-4)
    np.testing.assert_allclose(got_s, ref_s, atol=1e-6)
    for a, b in zip(got_v, ref_v):
        np.testing.assert_array_equal(a, b)


@requires_reference
def test_revise_kpts_matches_reference():
    import_reference()
    from tools.preprocess import (h36m_coco_format as ref_fmt,
                                  revise_kpts as ref_revise)

    rng = np.random.default_rng(1)
    kpts, scores = _fake_detections(rng)
    # force the substitution cases
    scores[0, 5, [2, 3, 5, 6]] = 0.1
    scores[0, 9, [3, 6]] = 0.1
    scores[1, 2, [3]] = 0.1

    ref_k, ref_s, ref_v = ref_fmt(kpts.copy(), scores.copy())
    got = revise_kpts(*h36m_coco_format(kpts.copy(), scores.copy()))
    ref = ref_revise(ref_k, ref_s, ref_v)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@requires_reference
def test_revise_skes_matches_reference():
    import_reference()
    from tools.preprocess import (h36m_coco_format as ref_fmt,
                                  revise_skes as ref_skes)

    rng = np.random.default_rng(2)
    kpts, scores = _fake_detections(rng)
    ref_k, _, valid = ref_fmt(kpts.copy(), scores.copy())
    preds = [rng.standard_normal((len(v), 17, 3)).astype(np.float32)
             for v in valid]

    ref = ref_skes([p.copy() for p in preds], ref_k.copy(),
                   [v.copy() for v in valid])
    got = revise_skes([p.copy() for p in preds], ref_k.copy(),
                      [v.copy() for v in valid])
    np.testing.assert_allclose(got, ref, atol=1e-5)


@requires_reference
def test_realtime_frame_converters_match_reference():
    """coco_h36m_frame / h36m_coco_kpts (0.3-spine realtime copies) match
    tools/utils.py:107-175."""
    import_reference()
    from tools.utils import (coco_h36m_frame as ref_frame,
                             h36m_coco_kpts as ref_kpts)

    from gastx.pipeline.keypoint_revision import (coco_h36m_frame,
                                                  h36m_coco_kpts)

    rng = np.random.default_rng(5)
    kpts = (rng.random((2, 17, 2)) * 640 + 1).astype(np.float32)
    scores = (rng.random((2, 17, 1)) * 0.6 + 0.35).astype(np.float32)
    scores[0, [2, 5], 0] = 0.1  # trigger a revision case

    np.testing.assert_allclose(coco_h36m_frame(kpts[0].copy()),
                               ref_frame(kpts[0].copy()), atol=1e-4)

    ref_k, ref_s = ref_kpts(kpts.copy(), scores.copy())
    got_k, got_s = h36m_coco_kpts(kpts.copy(), scores.copy())
    assert len(got_k) == len(ref_k)
    for a, b in zip(got_k, ref_k):
        np.testing.assert_allclose(a, b, atol=1e-4)
    # values only: the reference's `scores.squeeze(axis=2)` is a no-op bug
    # (result discarded), leaving its scores (17, 1); gastx returns the
    # intended (17,)
    for a, b in zip(got_s, ref_s):
        np.testing.assert_allclose(np.ravel(a), np.ravel(b), atol=1e-6)
