"""The in-the-wild 2D frame loop, UNstubbed.

Round-1 coverage stubbed `gen_video_kpts` everywhere; these tests execute the
real detect -> SORT -> box-selection -> crop -> HRNet -> decode flow
(gastx/pipeline/video_pose2d.py, reference gen_kpts.py:199-275) on a tiny
synthetic video with reduced random-weight backbones, and A/B the glue
(selection ordering, rounding, crop coordinates, zero-fill) against the
reference loop's semantics with shared inputs.
"""
import sys

import numpy as np
import pytest

from reference_torch import REFERENCE_PATH, reference_available
from test_hrnet import TINY_EXTRA
from test_yolo import TINY_CFG

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


def _write_biased_yolo_weights(path, blocks, seed=0, obj_bias=3.0):
    """Random darknet weights with the objectness biases lifted so the
    random detector actually emits above-threshold boxes (one shared
    serializer with test_yolo — the weight layout must not fork)."""
    from test_yolo import _write_random_weights

    _write_random_weights(path, blocks, seed=seed, obj_bias=obj_bias)


@pytest.fixture(scope="module")
def tiny_models(tmp_path_factory):
    """Reduced YOLO cfg/weights + reduced torch HRNet checkpoint."""
    import torch

    tmp = tmp_path_factory.mktemp("models")

    cfg_path = tmp / "tiny.cfg"
    cfg_path.write_text(TINY_CFG)
    from gastx.pipeline.yolo.cfg import parse_darknet_cfg
    blocks = parse_darknet_cfg(str(cfg_path))
    weights_path = tmp / "tiny.weights"
    _write_biased_yolo_weights(str(weights_path), blocks, seed=7)

    models_dir = REFERENCE_PATH + "/lib/pose/hrnet/lib/models"
    if models_dir not in sys.path:
        sys.path.insert(0, models_dir)
    import pose_hrnet as ref_mod

    torch.manual_seed(11)
    hrnet = ref_mod.PoseHighResolutionNet(
        {"MODEL": {"EXTRA": TINY_EXTRA, "NUM_JOINTS": 17}})
    for m in hrnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    hrnet.eval()
    hrnet_path = tmp / "tiny_hrnet.pth"
    torch.save(hrnet.state_dict(), str(hrnet_path))
    return str(cfg_path), str(weights_path), str(hrnet_path), hrnet


@pytest.fixture()
def tiny_video(tmp_path):
    import cv2

    path = str(tmp_path / "clip.mp4")
    w, h, t = 128, 96, 8
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (w, h))
    rng = np.random.default_rng(0)
    for i in range(t):
        frame = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
        # a bright moving blob gives detections something stable-ish
        x0 = 10 + 8 * i
        frame[20:70, x0:x0 + 30] = 220
        writer.write(frame)
    writer.release()
    return path, w, h, t


def _make_estimator(tiny_models, num_joints=17):
    from gastx.pipeline.video_pose2d import Pose2DEstimator

    cfg_path, weights_path, hrnet_path, _ = tiny_models
    return Pose2DEstimator(
        weights_path, hrnet_path, yolo_cfg=cfg_path, det_dim=96,
        image_size=(64, 96), confidence=0.5, hrnet_spec=TINY_EXTRA)


@requires_reference
def test_gen_video_kpts_unstubbed(tiny_models, tiny_video):
    """The REAL pipeline end to end: every frame yields (M, 17, 2) kpts in
    frame bounds, scores in [0, 1], zero-fill when fewer tracks than
    num_person (gen_kpts.py:245-255 semantics)."""
    from gastx.pipeline.video_pose2d import gen_video_kpts

    path, w, h, t = tiny_video
    est = _make_estimator(tiny_models)
    kpts, scores = gen_video_kpts(path, "unused", "unused", num_person=2,
                                  progress=False, estimator=est)

    assert kpts.ndim == 4 and kpts.shape[0] == 2 and kpts.shape[2:] == (17, 2)
    assert scores.shape == kpts.shape[:3]
    assert 1 <= kpts.shape[1] <= t  # frames with detections
    assert np.isfinite(kpts).all() and np.isfinite(scores).all()

    # decoded coordinates of real detections land around the frame (inverse
    # affine of the 1.25x padded crop can overshoot the box, not the canvas
    # by more than the pad); zero-filled person slots stay exactly zero
    zero_rows = (kpts == 0).all(axis=(2, 3))
    nz = ~zero_rows
    if nz.any():
        sel = kpts[nz]
        assert sel[..., 0].min() > -w and sel[..., 0].max() < 2 * w
        assert sel[..., 1].min() > -h and sel[..., 1].max() < 2 * h
    assert (scores[zero_rows] == 0).all()


@requires_reference
def test_frame_loop_matches_reference_glue(tiny_models, tiny_video):
    """A/B of the frame step against the reference loop's quoted semantics
    (gen_kpts.py:205-244):

    * `estimate_frame` must EXACTLY equal a manual pipeline built from the
      reference's own selection/rounding lines (track ordering
      people_track[-num_person:][::-1], round(.., 2), zero-fill) feeding the
      same crop/decode components — any glue/index divergence breaks bitwise
      equality.
    * On those real crops, the JAX HRNet heatmaps must match the torch
      oracle to 2e-4, and decoded coordinates must agree wherever the
      heatmap argmax cell is not a numerical tie.
    """
    import torch

    from gastx.pipeline.hrnet import get_final_preds, preprocess_boxes
    from gastx.pipeline.sort import Sort

    path, w, h, t = tiny_video
    est = _make_estimator(tiny_models)
    _, _, _, torch_hrnet = tiny_models

    import cv2
    cap = cv2.VideoCapture(path)
    num_person = 2

    # Shadow tracker fed the identical detection stream; deterministic, so
    # it must stay in lockstep with the estimator's internal one.
    ref_sort = Sort()

    frames_checked = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break

        bboxs, det_scores = est.detector.detect(frame)
        if bboxs is None or not bboxs.any():
            continue

        # gastx full frame step (updates est.tracker)
        result = est.estimate_frame(frame, num_person)

        # --- reference glue, quoted semantics (gen_kpts.py:213-232) ---
        people_track = ref_sort.update(
            np.concatenate([bboxs, det_scores], axis=1))
        if people_track.shape[0] == 1:
            ref_boxes = people_track[-1, :-1].reshape(1, 4)
        elif people_track.shape[0] >= 2:
            ref_boxes = people_track[-num_person:, :-1].reshape(-1, 4)[::-1]
        else:
            assert result is None
            continue
        assert result is not None
        got_preds, got_vals = result

        ref_track_boxes = [[round(float(v), 2) for v in box]
                           for box in ref_boxes]
        inputs_u8, centers, scales = preprocess_boxes(
            frame, ref_track_boxes, [64, 96], num_person, normalize=False)
        # Host-side normalized twin of the estimator's in-jit path, for
        # the torch oracle below.
        inputs, _, _ = preprocess_boxes(
            frame, ref_track_boxes, [64, 96], num_person)
        inputs_rgb = inputs[..., ::-1].copy()

        # (a) exact glue equality: same boxes -> same crops -> same decode
        # (through the estimator's own uint8-input jit, like
        # estimate_frame does)
        hm_jax = np.transpose(
            np.asarray(est._hrnet_u8(est.hrnet_params, inputs_u8)),
            (0, 3, 1, 2))
        want_preds, want_vals = get_final_preds(
            hm_jax, np.asarray(centers), np.asarray(scales))
        np.testing.assert_array_equal(got_preds, want_preds)
        np.testing.assert_array_equal(got_vals, want_vals)

        # (b) torch HRNet oracle on the same crops
        with torch.no_grad():
            hm_ref = torch_hrnet(torch.from_numpy(
                np.transpose(inputs_rgb, (0, 3, 1, 2)).copy())).numpy()
        np.testing.assert_allclose(hm_jax, hm_ref, atol=2e-4, rtol=1e-3)

        ref_preds, ref_vals = get_final_preds(
            hm_ref, np.asarray(centers), np.asarray(scales))
        np.testing.assert_allclose(got_vals, ref_vals, atol=2e-3)
        # compare decoded coords only where the argmax cell is unambiguous
        # (1e-4-level heatmap deltas can flip ties between cells)
        stable = np.isclose(got_preds, ref_preds, atol=0.51)
        assert stable.mean() > 0.8, "argmax cells diverge too often"
        np.testing.assert_allclose(got_preds[stable.all(axis=-1)],
                                   ref_preds[stable.all(axis=-1)], atol=0.51)
        frames_checked += 1

    cap.release()
    assert frames_checked >= 3, "too few frames exercised the full loop"


@requires_reference
def test_estimator_flip_tta_path(tiny_models, tiny_video):
    """Pose2DEstimator(flip_test=True): the TEST.FLIP_TEST heatmap TTA
    runs through the real 2D pipeline (same jitted HRNet forward on the
    mirrored crop, flip_back + average before decode) and yields valid,
    near-identical-contract keypoints."""
    import cv2

    from gastx.pipeline.video_pose2d import Pose2DEstimator

    cfg_path, weights_path, hrnet_path, _ = tiny_models
    est = Pose2DEstimator(
        weights_path, hrnet_path, yolo_cfg=cfg_path, det_dim=96,
        image_size=(64, 96), confidence=0.5, hrnet_spec=TINY_EXTRA,
        flip_test=True, shift_heatmap=True)

    path, w, h, t = tiny_video
    cap = cv2.VideoCapture(path)
    ret, frame = cap.read()
    cap.release()
    assert ret
    result = est.estimate_frame(frame, num_person=1)
    assert result is not None
    preds, maxvals = result
    assert preds.shape[1:] == (17, 2) and maxvals.shape[1:] == (17, 1)
    assert np.isfinite(preds).all()

    # The TTA average genuinely engages: with random weights the merged
    # heatmaps decode differently from the plain forward.
    est_plain = Pose2DEstimator(
        weights_path, hrnet_path, yolo_cfg=cfg_path, det_dim=96,
        image_size=(64, 96), confidence=0.5, hrnet_spec=TINY_EXTRA)
    plain, _ = est_plain.estimate_frame(frame, num_person=1)
    assert not np.allclose(preds, plain)


@requires_reference
def test_gen_video_kpts_batched_matches_per_frame(tiny_models, tiny_video):
    """The batched offline mode (batch_size > 1: one YOLO dispatch per
    chunk, one HRNet dispatch per chunk's crops) must reproduce the
    per-frame loop exactly — same detections feed the same tracker in
    the same order, pad frames discarded. batch_size=3 over t=8 frames
    exercises a full chunk, a chunk boundary, and the repeated-last-frame
    padding of the final partial chunk."""
    from gastx.pipeline.video_pose2d import gen_video_kpts

    path, w, h, t = tiny_video
    est_seq = _make_estimator(tiny_models)
    kpts_seq, scores_seq = gen_video_kpts(
        path, "unused", "unused", num_person=2, progress=False,
        estimator=est_seq)

    est_bat = _make_estimator(tiny_models)
    kpts_bat, scores_bat = gen_video_kpts(
        path, "unused", "unused", num_person=2, progress=False,
        estimator=est_bat, batch_size=3)

    # Batched convs round differently in the last bit (measured 1-ulp
    # heatmap deltas), so scores carry ~1e-7 noise and a quarter-pixel
    # decode shift could flip on an exact tie — glue bugs (ordering,
    # tracker divergence, pad-frame leakage) show up as whole-box errors,
    # far above these tolerances.
    assert kpts_seq.shape == kpts_bat.shape
    np.testing.assert_allclose(kpts_seq, kpts_bat, atol=2.0)
    np.testing.assert_allclose(scores_seq, scores_bat, atol=1e-5)


@requires_reference
def test_realtime_deep_split_pipeline_matches_sequential(tiny_models,
                                                         tiny_video,
                                                         tmp_path):
    """The realtime CLI's pooled stages (--pool-workers 2, the default)
    with the REAL estimator take the deep device/host detect split
    (detector.detect concurrent + ordered crops_from_detections), which
    the FakeEstimator test can't reach — the whole pipelined loop must be
    bit-identical to --no-pipeline. Per-frame device detect/HRNet calls
    are deterministic (same compiled executable, same inputs), so exact
    equality is the correct assertion."""
    from gastx.cli.realtime import parse_args, run

    path, _, _, _ = tiny_video
    outs = {}
    for mode, extra in (("seq", ["--no-pipeline"]), ("pipe", [])):
        est = _make_estimator(tiny_models)  # fresh SORT state per run
        out = str(tmp_path / f"{mode}.npz")
        run(parse_args(["-v", path, "--random-lifter-weights",
                        "--output", out] + extra),
            estimator=est)
        outs[mode] = np.load(out)["poses"]
    assert outs["seq"].shape == outs["pipe"].shape
    np.testing.assert_array_equal(outs["seq"], outs["pipe"])
