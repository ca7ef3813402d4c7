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


def test_trainval_render_branch(synthetic_h36m, capsys, monkeypatch):
    """The --render branch (reference trainval.py:202-258): train 1 epoch,
    lift the viz subject's sequence with TTA, export poses + a real mp4;
    then re-run under --evaluate with render_animation captured and check
    the GT-trajectory handling against the reference branch's math."""
    import jax

    from gastx.data.harness import load_data
    from gastx.geometry import camera_to_world, image_coordinates
    from gastx.infer import lift_sequences
    from gastx.models import GastNetConfig
    from gastx.train.checkpoint import load_checkpoint

    ckpt_dir = str(synthetic_h36m / "ckpt_render")
    viz_out = str(synthetic_h36m / "render.mp4")
    viz_export = str(synthetic_h36m / "pred")
    main([
        "-e", "1", "-arc", "3,3", "-ch", "16", "-b", "32",
        "--downsample", "1", "--checkpoint", ckpt_dir,
        "--checkpoint-frequency", "1",
        "--data-dir", str(synthetic_h36m / "data"),
        "--render", "--viz-subject", "S1", "--viz-action", "Walking 1",
        "--viz-camera", "0", "--viz-output", viz_out,
        "--viz-export", viz_export, "--viz-limit", "8",
        "--viz-downsample", "2", "--viz-size", "3",
    ])
    out = capsys.readouterr().out
    assert "Rendering..." in out
    assert os.path.exists(viz_out) and os.path.getsize(viz_out) > 0
    pred = np.load(viz_export + ".npy")
    assert pred.shape == (40, 17, 3) and np.isfinite(pred).all()

    # The exported prediction equals the library lifting path run on the
    # same checkpoint + keypoints (the render branch IS gastx.infer).
    (keypoints, dataset, _meta, kps_left, kps_right, _jl, _jr) = load_data(
        "h36m", "cpn_ft_h36m_dbb", str(synthetic_h36m / "data"))
    blob = load_checkpoint(os.path.join(ckpt_dir, "epoch_1.ckpt"))
    ts = blob["train_state"]
    cfg = GastNetConfig(filter_widths=(3, 3), channels=16)
    kp = keypoints["S1"]["Walking 1"][0]
    want = lift_sequences(jax.device_get(ts.params),
                          jax.device_get(ts.bn_state), [kp], cfg,
                          tta=True, kps_lr=(kps_left, kps_right))[0]
    np.testing.assert_allclose(pred, want, atol=1e-5)

    # --evaluate + --render with the renderer captured: the GT-trajectory
    # injection and camera_to_world transforms match the reference branch
    # (trainval.py:219-237) recomputed here from the dataset.
    captured = {}

    def fake_render(input_kpts, metadata, anim_output, *a, **kw):
        captured["anim"] = {k: np.array(v) for k, v in anim_output.items()}
        captured["kpts"] = np.array(input_kpts)

    import gastx.viz.animation as anim_mod
    monkeypatch.setattr(anim_mod, "render_animation", fake_render)
    main([
        "-arc", "3,3", "-ch", "16", "--downsample", "1",
        "--checkpoint", ckpt_dir, "--evaluate", "epoch_1.ckpt",
        "--data-dir", str(synthetic_h36m / "data"),
        "--render", "--viz-subject", "S1", "--viz-action", "Walking 1",
        "--viz-camera", "0",
        "--viz-output", str(synthetic_h36m / "render2.mp4"),
    ])
    assert "anim" in captured

    gt = dataset["S1"]["Walking 1"]["positions_3d"][0].copy()
    traj = gt[:, :1].copy()
    gt[:, 1:] += traj
    cam = dataset.cameras()["S1"][0]
    want_pred_world = np.asarray(camera_to_world(
        pred + traj, R=cam["orientation"], t=cam["translation"]))
    want_gt_world = np.asarray(camera_to_world(
        gt, R=cam["orientation"], t=cam["translation"]))
    np.testing.assert_allclose(captured["anim"]["Reconstruction"],
                               want_pred_world, atol=1e-5)
    np.testing.assert_allclose(captured["anim"]["Ground truth"],
                               want_gt_world, atol=1e-5)
    want_kpts = np.asarray(image_coordinates(
        kp[..., :2], w=cam["res_w"], h=cam["res_h"]))
    np.testing.assert_allclose(captured["kpts"], want_kpts, atol=1e-4)
