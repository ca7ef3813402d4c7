"""The flagship demo as an automated parity test.

Drives BOTH the reference reconstruction path (reconstruction.py:173-261:
load_json -> coco_h36m -> normalize -> UnchunkedGenerator(augment=True) ->
evaluate with flip-TTA -> camera_to_world(rot) -> height rebase) AND the
gastx `reconstruct` CLI on the reference's bundled
data/keypoints/baseball.json with the SAME random weights (shared through a
torch .bin checkpoint, exercising the import shim), and requires the output
3D sequences to agree to <0.1mm max per joint — the driver BASELINE parity
budget (README.md:92-100 documents this demo as the end-to-end check).
"""
import os

import numpy as np
import pytest

from reference_torch import (REFERENCE_PATH, build_reference_model,
                             import_reference, reference_available)

BASEBALL = os.path.join(REFERENCE_PATH, "data/keypoints/baseball.json")

requires_reference = pytest.mark.skipif(
    not (reference_available() and os.path.exists(BASEBALL)),
    reason="reference checkout (with baseball.json) not available")


@requires_reference
def test_baseball_reconstruction_parity(tmp_path):
    import torch

    import_reference()  # sys.path + torchsummary stub
    import reconstruction as ref_rec
    from common.camera import camera_to_world as ref_cam_to_world
    from common.camera import normalize_screen_coordinates as ref_norm
    from common.generators import UnchunkedGenerator as RefUnchunked
    from tools.mpii_coco_h36m import coco_h36m as ref_coco_h36m

    # --- shared random weights ---
    model = build_reference_model(num_joints=17, filter_widths=(3, 3, 3),
                                  channels=128, dropout=0.05, seed=3)
    bin_path = str(tmp_path / "rand_27f.bin")
    torch.save({"model_pos": model.state_dict()}, bin_path)

    # --- reference path (reconstruction.py:186-261, render skipped) ---
    joints_left, joints_right = [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]
    keypoints, _, _, _ = ref_rec.load_json(BASEBALL, 17)
    keypoints = keypoints[0]
    keypoints, valid_frames = ref_coco_h36m(keypoints)

    # no baseball.mp4 in this snapshot: both sides use the documented
    # 1000x1002 fallback resolution
    width, height = 1000, 1002
    input_keypoints = ref_norm(keypoints[..., :2], w=width, h=height)

    pad = (model.receptive_field() - 1) // 2
    gen = RefUnchunked(None, None, [input_keypoints[valid_frames]],
                       pad=pad, causal_shift=0, augment=True,
                       kps_left=joints_left, kps_right=joints_right,
                       joints_left=joints_left, joints_right=joints_right)
    pred = ref_rec.evaluate(gen, model, joints_left, joints_right,
                            return_predictions=True)
    pred = ref_cam_to_world(pred, R=ref_rec.rot, t=0)
    pred[:, :, 2] -= np.min(pred[:, :, 2])
    want = np.zeros((*input_keypoints.shape[:-1], 3), dtype=np.float32)
    want[valid_frames] = pred

    # --- gastx path: the real CLI with --no-render ---
    from gastx.cli.reconstruct import parse_args, reconstruct

    args = parse_args([
        "-w", bin_path, "-n", "17", "-k", BASEBALL, "-kf", "coco",
        "-vi", str(tmp_path / "missing.mp4"),
        "-vo", str(tmp_path / "out.mp4"), "--no-render",
    ])
    got = reconstruct(args)

    assert got.shape == want.shape == (keypoints.shape[0], 17, 3)
    assert len(valid_frames) > 200  # baseball.json: 277 valid frames
    err_mm = float(np.abs(got - want).max()) * 1000.0
    assert err_mm < 0.1, f"baseball demo parity {err_mm:.4f}mm >= 0.1mm"

    # the npz artifact the CLI wrote matches what it returned
    blob = np.load(str(tmp_path / "out.npz"))["reconstruction"]
    np.testing.assert_array_equal(blob, got)
