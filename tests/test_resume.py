"""Checkpoint/resume reproducibility: training 2 epochs straight equals
1 epoch + checkpoint + resume + 1 epoch (optimizer state, batcher RNG and
lr schedule all restored — the reference's resume contract,
trainval.py:98-106)."""
import jax
import numpy as np
import pytest

from gastx.cli.trainval import main

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]


@pytest.fixture()
def synthetic_h36m(tmp_path):
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    positions_3d = {}
    positions_2d = {}
    for s in SUBJECTS:
        t = 30
        positions_3d[s] = {"Walking 1": rng.standard_normal(
            (t, 32, 3)).astype(np.float32)}
        positions_2d[s] = {"Walking 1": [
            (rng.random((t, 17, 2)) * 1000).astype(np.float32)
            for _ in range(4)]}
    np.savez_compressed(data_dir / "data_3d_h36m.npz",
                        positions_3d=positions_3d)
    metadata = {"layout_name": "h36m", "num_joints": 17,
                "keypoints_symmetry": [[4, 5, 6, 11, 12, 13],
                                       [1, 2, 3, 14, 15, 16]]}
    np.savez_compressed(data_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz",
                        positions_2d=positions_2d, metadata=metadata)
    return tmp_path


def _run(tmp, name, args):
    ckpt = str(tmp / name)
    main(["-arc", "3,3", "-ch", "16", "-b", "32", "--downsample", "1",
          "--no-eval", "--checkpoint", ckpt, "--checkpoint-frequency", "1",
          "--data-dir", str(tmp / "data")] + args)
    return ckpt


def test_resume_reproduces_straight_run(synthetic_h36m):
    from gastx.train import load_checkpoint

    # Explicit: this resume-vs-straight bitwise comparison runs the real
    # trainval main loop over the 8-virtual-device DP mesh (conftest), so
    # checkpoint/resume-under-mesh is what is being certified here.
    assert len(jax.devices()) == 8

    straight = _run(synthetic_h36m, "straight", ["-e", "2"])
    resumed = _run(synthetic_h36m, "resumed", ["-e", "1"])
    _run(synthetic_h36m, "resumed", ["-e", "2", "-r", "epoch_1.ckpt"])

    a = load_checkpoint(straight + "/epoch_2.ckpt")
    b = load_checkpoint(resumed + "/epoch_2.ckpt")
    assert a["epoch"] == b["epoch"] == 2
    assert a["lr"] == pytest.approx(b["lr"])

    leaves_a = jax.tree_util.tree_leaves(a["train_state"].params)
    leaves_b = jax.tree_util.tree_leaves(b["train_state"].params)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # BN running stats too
    for x, y in zip(jax.tree_util.tree_leaves(a["train_state"].bn_state),
                    jax.tree_util.tree_leaves(b["train_state"].bn_state)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
