"""Realtime CLI glue test: synthetic video + stubbed 2D estimator ->
streaming causal lifting -> npz output."""
import numpy as np
import pytest


def test_realtime_npz(tmp_path, monkeypatch):
    import cv2

    path = str(tmp_path / "cam.mp4")
    w, h, t = 320, 240, 8
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (w, h))
    rng = np.random.default_rng(0)
    for _ in range(t):
        writer.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()

    class FakeEstimator:
        def __init__(self, *a, **k):
            pass

        def estimate_frame(self, frame, num_person=1, track=True):
            preds = (rng.random((num_person, 17, 2)) * [w, h]).astype(
                np.float32) + 1
            maxvals = rng.random((num_person, 17, 1)).astype(
                np.float32) * 0.5 + 0.5
            return preds, maxvals

    import gastx.pipeline.video_pose2d as vp
    monkeypatch.setattr(vp, "Pose2DEstimator", FakeEstimator)

    from gastx.cli.realtime import main
    out = str(tmp_path / "stream.npz")
    main(["-v", path, "--random-lifter-weights", "--output", out,
          "-f", "27"])

    poses = np.load(out)["poses"]
    assert poses.shape == (t, 1, 17, 3)
    assert np.isfinite(poses).all()
