"""HRNet parity tests: forward vs the reference torch PoseHighResolutionNet
(random weights, reduced config exercising every structural element),
affine transforms, and heatmap decode."""
import sys

import numpy as np
import pytest

from gastx.pipeline.hrnet import (
    box_to_center_scale,
    default_config,
    get_affine_transform,
    get_final_preds,
    get_max_preds,
    hrnet_extra,
    import_hrnet_params,
    hrnet_forward,
    preprocess_boxes,
    transform_preds,
)

from reference_torch import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

HRNET_LIB = REFERENCE_PATH + "/lib/pose/hrnet/lib"


def _stage(num_modules, num_branches, num_blocks, num_channels):
    return {"NUM_MODULES": num_modules, "NUM_BRANCHES": num_branches,
            "NUM_BLOCKS": list(num_blocks),
            "NUM_CHANNELS": list(num_channels), "BLOCK": "BASIC",
            "FUSE_METHOD": "SUM"}


# Small config: every structural element present (transitions, multi-module
# stage, 4-branch fuse, single-scale final module) at test-friendly width.
TINY_EXTRA = {
    "PRETRAINED_LAYERS": ["*"],
    "STEM_INPLANES": 64,
    "FINAL_CONV_KERNEL": 1,
    "STAGE2": _stage(1, 2, [2, 2], [8, 16]),
    "STAGE3": _stage(2, 3, [2, 2, 2], [8, 16, 32]),
    "STAGE4": _stage(1, 4, [2, 2, 2, 2], [8, 16, 32, 64]),
}
TINY_CFG = {"MODEL": {"EXTRA": TINY_EXTRA, "NUM_JOINTS": 17}}


@requires_reference
def test_hrnet_forward_matches_reference():
    import torch

    if HRNET_LIB + "/models" not in sys.path:
        sys.path.insert(0, HRNET_LIB + "/models")
    import pose_hrnet

    torch.manual_seed(0)
    model = pose_hrnet.PoseHighResolutionNet(TINY_CFG)
    # randomize BN stats so folding is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.1)
            m.bias.data.normal_(0, 0.1)
    model.eval()

    rng = np.random.default_rng(2)
    # input dims must be divisible by 32 (4 resolution levels below /4 stem)
    x = rng.standard_normal((2, 3, 96, 64)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_hrnet_params(sd, TINY_EXTRA)
    got = np.asarray(hrnet_forward(params, np.transpose(x, (0, 2, 3, 1)),
                                   TINY_EXTRA))
    got = np.transpose(got, (0, 3, 1, 2))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@requires_reference
def test_affine_transform_matches_reference():
    if HRNET_LIB not in sys.path:
        sys.path.insert(0, HRNET_LIB)
    from utils.transforms import get_affine_transform as ref_affine

    rng = np.random.default_rng(3)
    for _ in range(5):
        center = rng.random(2).astype(np.float32) * 500
        scale = rng.random(2).astype(np.float32) * 3 + 0.5
        rot = float(rng.uniform(-45, 45))
        out_size = [288, 384]
        ref = ref_affine(center, scale, rot, out_size)
        got = get_affine_transform(center, scale, rot, out_size)
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # inverse really inverts
        inv = get_affine_transform(center, scale, rot, out_size, inv=True)
        pt = np.array([100.0, 150.0])
        fwd = got @ np.array([pt[0], pt[1], 1.0])
        back = inv @ np.array([fwd[0], fwd[1], 1.0])
        np.testing.assert_allclose(back, pt, atol=1e-3)


@requires_reference
def test_box_to_center_scale_matches_reference():
    # utilitys.py imports torchvision (absent in this image) at module level;
    # stub it — box_to_center_scale itself never touches it.
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Compose = tvt.ToTensor = tvt.Normalize = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "_init_paths" not in sys.modules:
        sys.modules["_init_paths"] = types.ModuleType("_init_paths")
    if HRNET_LIB not in sys.path:
        sys.path.insert(0, HRNET_LIB)
    from utils.utilitys import box_to_center_scale as ref_b2cs

    for box in ([10, 20, 110, 240], [0, 0, 640, 480], [5, 5, 30, 200]):
        c_ref, s_ref = ref_b2cs(box, 1080, 1920)
        c, s = box_to_center_scale(box, 1080, 1920)
        np.testing.assert_allclose(c, c_ref, atol=1e-5)
        np.testing.assert_allclose(s, s_ref, atol=1e-5)


@requires_reference
def test_heatmap_decode_matches_reference():
    if HRNET_LIB not in sys.path:
        sys.path.insert(0, HRNET_LIB)
    from utils.inference import get_max_preds as ref_gmp

    rng = np.random.default_rng(4)
    hm = rng.random((3, 17, 96, 72)).astype(np.float32)
    ref_preds, ref_vals = ref_gmp(hm.copy())
    got_preds, got_vals = get_max_preds(hm.copy())
    np.testing.assert_allclose(got_preds, ref_preds, atol=1e-6)
    np.testing.assert_allclose(got_vals, ref_vals, atol=1e-6)


@requires_reference
def test_get_final_preds_matches_reference():
    if HRNET_LIB not in sys.path:
        sys.path.insert(0, HRNET_LIB)
    from utils.inference import get_final_preds as ref_gfp

    class _Cfg:
        class TEST:
            POST_PROCESS = True

    rng = np.random.default_rng(5)
    hm = rng.random((2, 17, 96, 72)).astype(np.float32)
    centers = [rng.random(2) * 500 for _ in range(2)]
    scales = [rng.random(2) * 2 + 0.5 for _ in range(2)]

    ref_preds, ref_vals = ref_gfp(_Cfg, hm.copy(), centers, scales)
    got_preds, got_vals = get_final_preds(hm.copy(), centers, scales,
                                          post_process=True)
    np.testing.assert_allclose(got_preds, ref_preds, atol=1e-4)
    np.testing.assert_allclose(got_vals, ref_vals, atol=1e-6)


def test_preprocess_boxes_shapes():
    img = np.random.default_rng(6).integers(
        0, 255, (480, 640, 3), dtype=np.uint8)
    inputs, centers, scales = preprocess_boxes(
        img, [[100, 100, 300, 400], [50, 50, 200, 250]], [288, 384])
    assert inputs.shape == (2, 384, 288, 3)
    assert len(centers) == len(scales) == 2


def test_config_yaml_merge(tmp_path):
    cfg = default_config()
    yaml_file = tmp_path / "exp.yaml"
    yaml_file.write_text(
        "MODEL:\n  NUM_JOINTS: 16\n  IMAGE_SIZE:\n  - 256\n  - 192\n"
        "TEST:\n    POST_PROCESS: false\n")
    from gastx.pipeline.hrnet import update_config
    update_config(cfg, str(yaml_file))
    assert cfg.MODEL.NUM_JOINTS == 16
    assert cfg.MODEL.IMAGE_SIZE == [256, 192]
    assert cfg.TEST.POST_PROCESS is False
    assert cfg.MODEL.EXTRA.STAGE4.NUM_BRANCHES == 4  # defaults intact


@requires_reference
def test_flip_back_matches_reference():
    """Heatmap flip-TTA un-flip (TEST.FLIP_TEST path) vs the reference
    lib/pose/hrnet/lib/utils/transforms.py:15-30."""
    if HRNET_LIB not in sys.path:
        sys.path.insert(0, HRNET_LIB)
    from utils.transforms import flip_back as ref_flip_back

    from gastx.pipeline.hrnet import COCO_FLIP_PAIRS, flip_back

    rng = np.random.default_rng(11)
    hm = rng.random((3, 17, 8, 6)).astype(np.float32)
    pairs = [list(p) for p in COCO_FLIP_PAIRS]
    ref = ref_flip_back(hm.copy(), pairs)
    got = flip_back(hm, COCO_FLIP_PAIRS)
    np.testing.assert_array_equal(got, ref)


def test_flip_tta_merge_semantics():
    """flip_tta_merge implements the standard HRNet FLIP_TEST average:
    identical predictions from both passes survive unchanged, and
    SHIFT_HEATMAP moves the un-flipped map right one column (col 0 kept)."""
    from gastx.pipeline.hrnet import COCO_FLIP_PAIRS, flip_back, flip_tta_merge

    rng = np.random.default_rng(12)
    hm = rng.random((2, 17, 8, 6)).astype(np.float32)
    # A flipped-input prediction that is exactly the mirrored ordinary one:
    # flip_back undoes it, so the TTA average equals the ordinary heatmaps.
    hm_flipped = flip_back(hm, COCO_FLIP_PAIRS)  # involution
    merged = flip_tta_merge(hm, hm_flipped, COCO_FLIP_PAIRS)
    np.testing.assert_allclose(merged, hm, atol=1e-7)

    shifted = flip_tta_merge(hm, hm_flipped, COCO_FLIP_PAIRS,
                             shift_heatmap=True)
    back = flip_back(hm_flipped, COCO_FLIP_PAIRS)
    expect = hm.copy()
    expect[:, :, :, 1:] = (hm[:, :, :, 1:] + back[:, :, :, :-1]) * 0.5
    expect[:, :, :, 0] = (hm[:, :, :, 0] + back[:, :, :, 0]) * 0.5
    np.testing.assert_allclose(shifted, expect, atol=1e-7)
