"""Data-harness unit tests: fetch downsample/subset/action-filter semantics
and the fixed deterministic_random (the reference's byteorder typo made
--subset < 1 crash upstream; SURVEY.md §2.5)."""
import numpy as np
import pytest

from gastx.data.harness import deterministic_random, fetch


class _FakeDataset:
    def __init__(self, data, cameras):
        self._data = data
        self._cameras = cameras

    def __getitem__(self, key):
        return self._data[key]

    def cameras(self):
        return self._cameras


def _setup(lengths=(100, 57)):
    rng = np.random.default_rng(0)
    keypoints = {"S1": {}}
    data = {"S1": {}}
    cameras = {"S1": [{"intrinsic": np.arange(9, dtype=np.float32)}
                      for _ in range(2)]}
    for i, (action, t) in enumerate(zip(("Walking 1", "Eating 1"), lengths)):
        keypoints["S1"][action] = [
            rng.standard_normal((t, 17, 2)).astype(np.float32)
            for _ in range(2)]
        data["S1"][action] = {
            "positions_3d": [rng.standard_normal((t, 17, 3)).astype(
                np.float32) for _ in range(2)]}
    return _FakeDataset(data, cameras), keypoints


def test_deterministic_random_stable():
    a = deterministic_random(0, 100, "hello")
    b = deterministic_random(0, 100, "hello")
    assert a == b and 0 <= a < 100
    # The string argument must actually steer the value (the reference's
    # byteorder typo class of bug): across several seeds at least one
    # other-string draw must differ.
    assert any(deterministic_random(0, 100, f"other{i}") != a
               for i in range(8))


def test_fetch_downsample():
    dataset, keypoints = _setup()
    cams, p3d, p2d = fetch(["S1"], None, dataset, keypoints, downsample=5)
    assert len(p2d) == 4  # 2 actions x 2 cameras
    assert p2d[0].shape[0] == 20  # 100 / 5
    assert p3d[0].shape[0] == 20
    assert len(cams) == 4


def test_fetch_subset_deterministic():
    dataset, keypoints = _setup()
    _, p3d_a, p2d_a = fetch(["S1"], None, dataset, keypoints, downsample=2,
                            subset=0.5)
    _, p3d_b, p2d_b = fetch(["S1"], None, dataset, keypoints, downsample=2,
                            subset=0.5)
    # deterministic windows, roughly half the downsampled length
    for a, b in zip(p2d_a, p2d_b):
        np.testing.assert_array_equal(a, b)
    assert p2d_a[0].shape[0] == 25  # round(100//2 * 0.5) strided by 2
    assert p3d_a[0].shape[0] == p2d_a[0].shape[0]


def test_fetch_action_filter():
    dataset, keypoints = _setup()
    _, _, p2d = fetch(["S1"], ["Walking"], dataset, keypoints, downsample=1)
    assert len(p2d) == 2  # only Walking's cameras
    assert p2d[0].shape[0] == 100
