"""Realtime CLI glue tests: synthetic video + stubbed 2D estimator ->
streaming causal lifting -> npz output; the pipelined loop (default)
must produce bit-identical output to the sequential one."""
import numpy as np
import pytest


def _write_clip(path, w, h, t, seed=0):
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (w, h))
    rng = np.random.default_rng(seed)
    for _ in range(t):
        writer.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()


class FakeEstimator:
    """Deterministic stand-in with the real split API: per-frame 2D
    keypoints are a pure function of the frame index, so sequential and
    pipelined loops see identical streams."""

    def __init__(self, w, h, *, drop_every=0):
        self.w, self.h = w, h
        self.drop_every = drop_every
        self._n_detect = 0

    def detect_crops(self, frame, num_person=1, track=True):
        i = self._n_detect
        self._n_detect += 1
        if self.drop_every and i % self.drop_every == 0:
            return None  # exercise the detection-less frame path
        rng = np.random.default_rng(1000 + i)
        crops = rng.random((num_person, 4)).astype(np.float32)
        return crops, i, num_person

    def pose_from_crops(self, crops, i, num_person):
        rng = np.random.default_rng(2000 + i)
        preds = (rng.random((num_person, 17, 2))
                 * [self.w, self.h]).astype(np.float32) + 1
        maxvals = rng.random((num_person, 17, 1)).astype(
            np.float32) * 0.5 + 0.5
        return preds, maxvals

    def estimate_frame(self, frame, num_person=1, track=True):
        crops = self.detect_crops(frame, num_person, track=track)
        if crops is None:
            return None
        return self.pose_from_crops(*crops)


def test_realtime_npz(tmp_path):
    path = str(tmp_path / "cam.mp4")
    w, h, t = 320, 240, 8
    _write_clip(path, w, h, t)

    from gastx.cli.realtime import parse_args, run
    out = str(tmp_path / "stream.npz")
    run(parse_args(["-v", path, "--random-lifter-weights", "--output", out,
                    "-f", "27"]),
        estimator=FakeEstimator(w, h))

    poses = np.load(out)["poses"]
    assert poses.shape == (t, 1, 17, 3)
    assert np.isfinite(poses).all()


@pytest.mark.parametrize("drop_every", [0, 3])
def test_pipelined_loop_matches_sequential(tmp_path, drop_every):
    """The 3-stage pipelined loop (default) is an overlap of the SAME
    per-frame computation — outputs must be bit-identical to
    --no-pipeline, including frames with no detection."""
    path = str(tmp_path / "cam.mp4")
    w, h, t = 160, 120, 10
    _write_clip(path, w, h, t)

    from gastx.cli.realtime import parse_args, run

    outs = {}
    for mode, extra in (("seq", ["--no-pipeline"]), ("pipe", []),
                        ("pipe1", ["--pool-workers", "1"])):
        poses = run(
            parse_args(["-v", path, "--random-lifter-weights", "-f", "27"]
                       + extra),
            estimator=FakeEstimator(w, h, drop_every=drop_every))
        outs[mode] = poses

    expected = t - (t + drop_every - 1) // drop_every if drop_every else t
    assert outs["seq"].shape[0] == expected
    # Default (pooled HRNet stage; FakeEstimator lacks the device detect
    # split, so detect falls back to the ordered stage) and the all-
    # ordered --pool-workers 1 pipeline must both be bit-identical.
    np.testing.assert_array_equal(outs["seq"], outs["pipe"])
    np.testing.assert_array_equal(outs["seq"], outs["pipe1"])


def test_pipeline_error_propagates_and_shuts_down(tmp_path):
    """A stage exception must re-raise in the caller, and the pipeline's
    worker threads must all exit (no leak for long-running library
    callers that survive the error)."""
    import threading
    import time as _time

    path = str(tmp_path / "cam.mp4")
    w, h, t = 160, 120, 12
    _write_clip(path, w, h, t)

    class Bomb(FakeEstimator):
        def detect_crops(self, frame, num_person=1, track=True):
            if self._n_detect == 5:
                raise RuntimeError("boom at frame 5")
            return super().detect_crops(frame, num_person, track)

    from gastx.cli.realtime import parse_args, run

    before = threading.active_count()
    with pytest.raises(RuntimeError, match="boom at frame 5"):
        run(parse_args(["-v", path, "--random-lifter-weights", "-f", "27"]),
            estimator=Bomb(w, h))
    deadline = _time.time() + 10.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before
