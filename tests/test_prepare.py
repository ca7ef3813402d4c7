"""Data-preparation converter tests for the Stacked-Hourglass and generic
2D pipelines (reference data/prepare_data_2d_h36m_sh.py /
prepare_data_2d_h36m_generic.py): real archive layouts (ZIP-with-h36m/-level
pretrained, tar.gz fine-tuned), the corrupted S11/Directions skip, and the
_ALL concatenated-file skip."""
import os
import tarfile
import zipfile

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

CAMS = ["54138969", "55011271", "58860488", "60457274"]


def _write_h5(path, frames=4):
    with h5py.File(path, "w") as hf:
        hf["poses"] = np.random.default_rng(0).random(
            (frames, 16, 2)).astype(np.float32)


def _build_tree(root, subdir):
    """<root>/<subject>/<subdir>/<action>.<cam>.h5 for two subjects."""
    for subject, actions in (("S1", ["Directions_1", "Walking_1"]),
                             ("S11", ["Directions", "Walking_1"])):
        d = os.path.join(root, subject, subdir)
        os.makedirs(d)
        for action in actions:
            for cam in CAMS:
                _write_h5(os.path.join(d, f"{action}.{cam}.h5"))


def test_prepare_2d_sh_zip_and_tar_layouts(tmp_path, monkeypatch):
    from gastx.data.prepare import prepare_2d_sh

    # pretrained: ZIP containing h36m/<subject>/StackedHourglass/
    pt_root = tmp_path / "pt"
    _build_tree(str(pt_root / "h36m"), "StackedHourglass")
    pt_zip = str(tmp_path / "h36m.zip")
    with zipfile.ZipFile(pt_zip, "w") as zf:
        for dirpath, _, files in os.walk(pt_root):
            for f in files:
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, pt_root))

    # fine-tuned: tar.gz containing <subject>/StackedHourglassFineTuned240/
    ft_root = tmp_path / "ft"
    _build_tree(str(ft_root), "StackedHourglassFineTuned240")
    ft_tar = str(tmp_path / "h36m_ft.tar.gz")
    with tarfile.open(ft_tar, "w:gz") as tar:
        tar.add(str(ft_root), arcname=".")

    monkeypatch.chdir(tmp_path)
    outputs = prepare_2d_sh(archive_pt=pt_zip, archive_ft=ft_tar)
    assert outputs == ["data_2d_h36m_sh_pt_mpii.npz",
                       "data_2d_h36m_sh_ft_h36m.npz"]

    for output in outputs:
        blob = np.load(str(tmp_path / output), allow_pickle=True)
        poses = blob["positions_2d"].item()
        assert set(poses.keys()) == {"S1", "S11"}
        assert set(poses["S1"].keys()) == {"Directions 1", "Walking 1"}
        # corrupted S11 'Directions' video skipped (reference :43-45)
        assert set(poses["S11"].keys()) == {"Walking 1"}
        assert len(poses["S1"]["Walking 1"]) == 4
        assert all(p.shape == (4, 16, 2) for p in poses["S1"]["Walking 1"])
        meta = blob["metadata"].item()
        assert meta["keypoints_symmetry"][0] == [3, 4, 5, 13, 14, 15]


def test_prepare_2d_generic_skips(tmp_path, monkeypatch):
    from gastx.data.prepare import prepare_2d_generic

    src = tmp_path / "npz"
    src.mkdir()

    def write(name, frames=3):
        np.savez(str(src / name), keypoints=np.random.default_rng(1).random(
            (frames, 17, 3)).astype(np.float32))

    write("S1_Walking_1.0.npz")
    write("S11_Directions.0.npz")     # corrupted video -> skipped
    write("S11_Directions_1.0.npz")   # 'Directions 1' is fine
    write("S1_Walking_1_ALL.npz")     # concatenated-cameras file -> skipped

    monkeypatch.chdir(tmp_path)
    output = prepare_2d_generic(str(src), "test_cpn_coco")
    poses = np.load(str(tmp_path / output),
                    allow_pickle=True)["positions_2d"].item()
    assert set(poses["S1"].keys()) == {"Walking 1"}
    assert set(poses["S11"].keys()) == {"Directions 1"}


def test_cfgnode_merge_from_list_coerces_types():
    """yacs-parity CLI overrides: values decode to the existing entry's
    type (yacs default.py _decode_cfg_value semantics)."""
    from gastx.pipeline.hrnet import experiment_config

    cfg = experiment_config("coco/hrnet/w48_384x288_adam_lr1e-3")
    cfg.merge_from_list(["TEST.FLIP_TEST", "false",
                         "MODEL.IMAGE_SIZE", "[192, 256]"])
    assert cfg.TEST.FLIP_TEST is False
    assert list(cfg.MODEL.IMAGE_SIZE) == [192, 256]

    with pytest.raises(ValueError):
        cfg.merge_from_list(["TEST.FLIP_TEST", "not-a-bool"])
