"""End-to-end trainval CLI test on a tiny synthetic H36M-shaped dataset:
load_data -> fetch -> train epochs -> per-epoch eval -> checkpoints ->
action-wise protocol evaluation, all through the real CLI entry point."""
import os

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
        t = 40
        positions_3d[s] = {"Walking 1": rng.standard_normal(
            (t, 32, 3)).astype(np.float32)}
        # 4 cameras of 17-joint detections in pixel coords
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


def test_trainval_end_to_end(synthetic_h36m, capsys):
    ckpt_dir = str(synthetic_h36m / "ckpt")
    log_file = str(synthetic_h36m / "metrics.jsonl")
    main([
        "-e", "1", "-arc", "3,3", "-ch", "16", "-b", "32",
        "--downsample", "1", "--checkpoint", ckpt_dir,
        "--checkpoint-frequency", "1", "--log-file", log_file,
        "--data-dir", str(synthetic_h36m / "data"),
    ])
    out = capsys.readouterr().out
    # conftest forces 8 virtual CPU devices, so this end-to-end run (and the
    # 2-epoch resume test in test_resume.py that shares this fixture shape)
    # exercises the REAL main loop over an 8-device DP mesh, not one device.
    assert "data-parallel mesh over 8 device(s)" in out
    assert "Receptive field: 9 frames" in out
    assert "3d_valid" in out
    assert "action-wise average" in out
    assert os.path.exists(os.path.join(ckpt_dir, "epoch_1.ckpt"))

    import json
    with open(log_file) as f:
        record = json.loads(f.readline())
    assert record["step"] == 1 and "train_mpjpe_mm" in record

    # Resume from the checkpoint and evaluate only.
    main([
        "-arc", "3,3", "-ch", "16", "--downsample", "1",
        "--checkpoint", ckpt_dir, "--evaluate", "epoch_1.ckpt",
        "--data-dir", str(synthetic_h36m / "data"),
    ])
    out = capsys.readouterr().out
    assert "Protocol #1" in out and "Protocol #2" in out


def test_trainval_matmul_precision_mixed_runs(synthetic_h36m, capsys):
    """The gastx-only --matmul-precision knob through the REAL CLI main
    loop (1 epoch, mixed tier, 8-device DP mesh). Tiers are CPU no-ops, so
    this certifies the flag plumbing end-to-end; the on-chip throughput /
    convergence numbers live in scripts/perf_lab5.py."""
    ckpt_dir = str(synthetic_h36m / "ckpt_mixed")
    main([
        "-e", "1", "-arc", "3,3", "-ch", "16", "-b", "32",
        "--downsample", "1", "--checkpoint", ckpt_dir,
        "--checkpoint-frequency", "1", "--matmul-precision", "mixed",
        "--data-dir", str(synthetic_h36m / "data"),
    ])
    out = capsys.readouterr().out
    assert "3d_valid" in out
    assert os.path.exists(os.path.join(ckpt_dir, "epoch_1.ckpt"))
