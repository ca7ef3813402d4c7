"""YOLOv3 parity tests: cfg spec equivalence, and forward/weights-loader
parity against the reference torch Darknet on a small synthetic network with
random weights (exercises conv+BN folding, conv-no-BN, route single/concat,
shortcut, upsample, and the yolo decode)."""
import os

import numpy as np
import pytest

from gastx.pipeline.yolo import (
    filter_person_detections,
    greedy_nms,
    letterbox_image,
    load_darknet_weights,
    make_yolo_forward,
    parse_darknet_cfg,
    rescale_boxes,
    yolov3_blocks,
)
from gastx.pipeline.yolo.model import _infer_channels

from reference_torch import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

TINY_CFG = """
[net]
batch=1
width=96
height=96
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=255
activation=linear

[yolo]
mask = 6,7,8
anchors = 10,13,  16,30,  33,23,  30,61,  62,45,  59,119,  116,90,  156,198,  373,326
classes=80
num=9
jitter=.3
ignore_thresh = .5
truth_thresh = 1
random=1

[route]
layers = -3

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[upsample]
stride=2

[route]
layers = -1, 4

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=255
activation=linear

[yolo]
mask = 3,4,5
anchors = 10,13,  16,30,  33,23,  30,61,  62,45,  59,119,  116,90,  156,198,  373,326
classes=80
num=9
jitter=.3
ignore_thresh = .5
truth_thresh = 1
random=1
"""


def _write_random_weights(path, blocks, seed=0, obj_bias=0.0):
    """Random darknet-format weights. ``obj_bias`` lifts the detection
    heads' objectness/person-class bias logits so a random detector emits
    above-threshold boxes (used by the e2e pipeline tests)."""
    rng = np.random.default_rng(seed)
    chans = _infer_channels(blocks, int(blocks[0].get("channels", 3)))
    floats = []
    for i, b in enumerate(blocks[1:]):
        if b["type"] != "convolutional":
            continue
        f = int(b["filters"])
        k = int(b["size"])
        c_in = chans[i]
        if int(b.get("batch_normalize", 0)) == 1:
            floats.append(rng.standard_normal(f) * 0.1)       # bn bias
            floats.append(rng.standard_normal(f) * 0.1 + 1.0)  # bn scale
            floats.append(rng.standard_normal(f) * 0.1)       # bn mean
            floats.append(np.abs(rng.standard_normal(f)) + 0.5)  # bn var
        else:
            bias = rng.standard_normal(f) * 0.1               # conv bias
            if obj_bias and f == 255:  # detection head: 3 anchors x (5+80)
                bias = bias.reshape(3, 85)
                bias[:, 4] += obj_bias       # objectness logit
                bias[:, 5] += obj_bias       # person-class logit
                bias = bias.reshape(-1)
            floats.append(bias)
        floats.append(rng.standard_normal(f * c_in * k * k) * 0.1)
    with open(path, "wb") as fh:
        np.zeros(5, np.int32).tofile(fh)
        np.concatenate(floats).astype(np.float32).tofile(fh)


def test_generated_spec_matches_upstream_cfg():
    ref_cfg = os.path.join(REFERENCE_PATH,
                           "lib/detector/yolov3/cfg/yolov3.cfg")
    if not os.path.exists(ref_cfg):
        pytest.skip("upstream cfg not available")
    ref = parse_darknet_cfg(ref_cfg)
    gen = yolov3_blocks()
    assert len(ref) == len(gen) == 108
    for a, b in zip(ref, gen):
        assert a["type"] == b["type"]
        for key in ("filters", "size", "stride", "from", "layers", "mask"):
            assert (key in a) == (key in b)
            if key in a:
                assert (a[key].replace(" ", "")
                        == b[key].replace(" ", "")), (a, b)


@requires_reference
def test_forward_matches_reference_torch(tmp_path):
    import torch
    from reference_torch import import_reference
    import_reference()
    from lib.detector.yolov3.darknet import Darknet

    cfg_path = tmp_path / "tiny.cfg"
    cfg_path.write_text(TINY_CFG)
    blocks = parse_darknet_cfg(str(cfg_path))
    weights_path = tmp_path / "tiny.weights"
    _write_random_weights(str(weights_path), blocks)

    # reference torch model
    model = Darknet(str(cfg_path))
    model.load_weights(str(weights_path))
    model.net_info["height"] = 96
    model.eval()

    rng = np.random.default_rng(1)
    img = rng.random((1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img), False).numpy()

    # gastx model (NHWC)
    params = load_darknet_weights(str(weights_path), blocks)
    fwd = make_yolo_forward(blocks, inp_dim=96)
    got = np.asarray(fwd(params, np.transpose(img, (0, 2, 3, 1))))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_greedy_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = greedy_nms(boxes, scores, 0.4)
    assert list(keep) == [0, 2]


def test_filter_person_detections():
    raw = np.zeros((4, 85), dtype=np.float32)
    # box 0: confident person
    raw[0, :5] = [50, 50, 20, 40, 0.95]
    raw[0, 5] = 0.9
    # box 1: confident but a car (class 2)
    raw[1, :5] = [100, 100, 30, 30, 0.9]
    raw[1, 7] = 0.8
    # box 2: low-confidence person
    raw[2, :5] = [10, 10, 5, 5, 0.1]
    raw[2, 5] = 0.9
    # box 3: overlapping duplicate of box 0
    raw[3, :5] = [51, 51, 20, 40, 0.85]
    raw[3, 5] = 0.9

    dets = filter_person_detections(raw)
    assert dets.shape[0] == 1
    np.testing.assert_allclose(dets[0, :4], [40, 30, 60, 70], atol=1e-5)


def test_rescale_boxes_roundtrip():
    # A box spanning the full letterboxed image maps back to the full frame.
    inp_dim, w, h = 416, 1920, 1080
    scale = min(inp_dim / w, inp_dim / h)
    x0 = 0.0
    y0 = (inp_dim - scale * h) / 2
    dets = np.array([[x0, y0, x0 + scale * w, y0 + scale * h, 1.0, 1.0]],
                    dtype=np.float32)
    out = rescale_boxes(dets, inp_dim, w, h)
    np.testing.assert_allclose(out[0, :4], [0, 0, w, h], atol=0.5)


def test_letterbox_shape_and_padding():
    img = np.full((100, 200, 3), 255, dtype=np.uint8)
    canvas = letterbox_image(img, 416)
    assert canvas.shape == (416, 416, 3)
    assert (canvas[0] == 128).all()  # top padding
    assert (canvas[208] == 255).all()  # center content
