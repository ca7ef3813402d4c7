"""gen_skes CLI glue test: synthetic video + stubbed 2D keypoint stage ->
full lifting / revision / npz output path."""
import numpy as np
import pytest


@pytest.fixture()
def tiny_video(tmp_path):
    import cv2

    path = str(tmp_path / "clip.mp4")
    w, h, t = 320, 240, 12
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (w, h))
    rng = np.random.default_rng(0)
    for i in range(t):
        frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        writer.write(frame)
    writer.release()
    return path, w, h, t


def test_gen_skes_npz_output(tiny_video, tmp_path, monkeypatch):
    path, w, h, t = tiny_video

    rng = np.random.default_rng(1)

    def fake_gen_video_kpts(video, yolo_weights, hrnet_weights,
                            num_person=1, yolo_cfg=None, **kw):
        kpts = (rng.random((num_person, t, 17, 2)) * [w, h]).astype(
            np.float32) + 1
        scores = rng.random((num_person, t, 17)).astype(np.float32) * 0.5 + 0.5
        return kpts, scores

    import gastx.pipeline.video_pose2d as vp
    monkeypatch.setattr(vp, "gen_video_kpts", fake_gen_video_kpts)

    from gastx.cli.gen_skes import main
    out_dir = str(tmp_path / "out")
    main(["-v", path, "-np", "2", "--random-lifter-weights",
          "-o", out_dir, "-f", "27"])

    blob = np.load(out_dir + "/clip_3d.npz")["reconstruction"]
    assert blob.shape == (2, t, 17, 3)
    assert np.isfinite(blob).all()
    # height rebased: global min z is 0
    assert abs(blob[..., 2].min()) < 1e-5


def test_gen_skes_animation_output(tiny_video, tmp_path, monkeypatch):
    """--animation renders the multi-person animation (pillow GIF fallback
    on hosts without ffmpeg)."""
    import os

    path, w, h, t = tiny_video
    rng = np.random.default_rng(2)

    def fake_gen_video_kpts(video, yolo_weights, hrnet_weights,
                            num_person=1, yolo_cfg=None, **kw):
        kpts = (rng.random((num_person, t, 17, 2)) * [w, h]).astype(
            np.float32) + 1
        scores = rng.random((num_person, t, 17)).astype(np.float32) * 0.5 + 0.5
        return kpts, scores

    import gastx.pipeline.video_pose2d as vp
    monkeypatch.setattr(vp, "gen_video_kpts", fake_gen_video_kpts)

    from gastx.cli.gen_skes import main
    out_dir = str(tmp_path / "anim_out")
    main(["-v", path, "-np", "1", "--random-lifter-weights", "--animation",
          "-o", out_dir, "-f", "27"])

    outputs = os.listdir(out_dir)
    assert any(f.startswith("clip_3d") for f in outputs), outputs
    produced = os.path.join(out_dir, sorted(outputs)[0])
    assert os.path.getsize(produced) > 1000
