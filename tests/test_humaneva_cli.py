"""HumanEva-path trainval test: synthetic humaneva15 dataset through the
real CLI (COCO-17 -> 15-joint remap in load_data, Train/Validate subject
prefixes, by-subject evaluation — BASELINE config 3 shape)."""
import numpy as np
import pytest

from gastx.cli.trainval import main

TRAIN = ["Train/S1", "Train/S2", "Train/S3"]
VALID = ["Validate/S1", "Validate/S2", "Validate/S3"]


@pytest.fixture()
def synthetic_humaneva(tmp_path):
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir()

    positions_3d = {}
    positions_2d = {}
    for s in TRAIN + VALID:
        t = 30
        positions_3d[s] = {
            "Walking 1 chunk0": rng.standard_normal((t, 15, 3)).astype(
                np.float32)}
        # 2D detections arrive as COCO-17 (Mask-RCNN), 3 cameras
        positions_2d[s] = {"Walking 1 chunk0": [
            (rng.random((t, 17, 3)) * 640).astype(np.float32)
            for _ in range(3)]}

    np.savez_compressed(data_dir / "data_3d_humaneva15.npz",
                        positions_3d=positions_3d)
    metadata = {"layout_name": "coco", "num_joints": 17,
                "keypoints_symmetry": [[1, 3, 5, 7, 9, 11, 13, 15],
                                       [2, 4, 6, 8, 10, 12, 14, 16]]}
    np.savez_compressed(
        data_dir / "data_2d_humaneva15_detectron_pt_coco.npz",
        positions_2d=positions_2d, metadata=metadata)
    return tmp_path


def test_humaneva_train_and_by_subject_eval(synthetic_humaneva, capsys):
    ckpt = str(synthetic_humaneva / "ckpt")
    main([
        "-d", "humaneva15", "-k", "detectron_pt_coco",
        "-str", "Train/S1,Train/S2,Train/S3",
        "-ste", "Validate/S1,Validate/S2,Validate/S3",
        "-a", "Walking", "-e", "1", "-arc", "3,3", "-ch", "16", "-b", "32",
        "-drop", "0.5", "-lrd", "0.98", "--downsample", "1",
        "--by-subject", "--checkpoint", ckpt,
        "--data-dir", str(synthetic_humaneva / "data"),
    ])
    out = capsys.readouterr().out
    assert "Receptive field: 9 frames" in out
    # by-subject evaluation printed per validate subject
    assert out.count("Evaluating on subject") == 3
    assert "Protocol #1" in out
