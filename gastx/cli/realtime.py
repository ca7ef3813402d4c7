"""Real-time 3D pose estimation from a camera or video stream.

Parity target: the reference's real-time claim (README.md:7) backed by its
causal models + per-frame pipeline (gen_skes.py:43-69 ``load_model_realtime``,
tools/inference.py:73-110 ``gen_pose_frame``, tools/preprocess.py:158-172
``revise_skes_real_time``).

Per frame: YOLO detect -> SORT track -> HRNet 2D -> causal streaming lift
(one jitted device step via the device-resident window ring) -> real-time
placement. Output: live overlay window (if a display exists), or a 3D-pose
npz when ``--output`` is given.

    python -m gastx.cli.realtime -v camera --yolo-weights ... \
        --hrnet-weights ... -w 27_frame_model_causal.bin
    python -m gastx.cli.realtime -v video.mp4 --output out.npz
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="gastx real-time 3D pose")
    parser.add_argument("-v", "--video", type=str, default="camera",
                        help="'camera' (device 0) or a video path")
    parser.add_argument("-np", "--num-person", type=int, default=1)
    parser.add_argument("-f", "--frames", type=int, default=27,
                        help="causal receptive field (27/81)")
    parser.add_argument("-w", "--weight", type=str,
                        default="./checkpoint/gastnet/27_frame_model_causal.bin")
    parser.add_argument("--yolo-weights", type=str,
                        default="./checkpoint/yolov3/yolov3.weights")
    parser.add_argument("--hrnet-weights", type=str,
                        default="./checkpoint/hrnet/pose_hrnet_w48_384x288.pth")
    parser.add_argument("--yolo-cfg", type=str, default=None)
    parser.add_argument("--output", type=str, default=None,
                        help="npz path for the streamed 3D poses")
    parser.add_argument("--max-frames", type=int, default=-1)
    parser.add_argument("--display", action="store_true",
                        help="show the live 2D overlay window")
    parser.add_argument("--random-lifter-weights", action="store_true")
    parser.add_argument("--no-pipeline", action="store_true",
                        help="strictly sequential per-frame loop (the "
                             "pipelined default overlaps the detect / "
                             "2D-pose / lift device dispatches of "
                             "neighbouring frames; outputs are identical)")
    return parser.parse_args(argv)


def _pipelined_loop(cap, estimator, args, lift_and_place, should_stop,
                    depth: int = 4) -> int:
    """Three-stage software pipeline over frames.

    Per frame the host loop performs three device dispatches — YOLO
    detect, HRNet 2D pose, causal streaming lift — each costing a fixed
    tunnel/dispatch round-trip on top of sub-ms chip time. Run
    sequentially they serialize (the measured 5.8 fps floor of
    scripts/perf_lab9.py); pipelined across NEIGHBOURING frames the
    round-trips overlap, so steady-state throughput approaches the
    slowest single stage instead of the sum.

    Stages (one worker thread each, FIFO queues of ``depth``):

      reader:  cap.read                              -> q0
      stage 1: detect + SORT track + affine crops    -> q1   (ordered:
               owns the tracker state)
      stage 2: HRNet heatmaps + decode               -> q2
      main:    convert + streaming lift + placement  (ordered: owns the
               lifter window state; runs ``lift_and_place``)

    Every stage processes frames strictly in order, so tracker and
    streaming-lifter state evolve exactly as in the sequential loop and
    the output npz is bit-identical (tests/test_realtime_cli.py asserts
    it).
    Exceptions propagate to the caller; the sentinel ``None`` flushes
    the pipe.
    """
    import queue
    import threading

    q0 = queue.Queue(maxsize=depth)
    q1 = queue.Queue(maxsize=depth)
    q2 = queue.Queue(maxsize=depth)
    quit_evt = threading.Event()

    def reader():
        n = 0
        while not quit_evt.is_set() and (args.max_frames < 0
                                         or n < args.max_frames):
            ret, frame = cap.read()
            if not ret:
                break
            n += 1
            q0.put(frame)
        q0.put(None)

    def worker(q_in, q_out, fn):
        try:
            while True:
                item = q_in.get()
                if item is None or quit_evt.is_set():
                    break
                q_out.put(fn(item))
        except BaseException as exc:  # propagated by the main loop
            q_out.put(exc)
        finally:
            q_out.put(None)

    def stage1(frame):
        return frame, estimator.detect_crops(frame, args.num_person)

    def stage2(item):
        frame, crops = item
        if crops is None:
            return frame, None
        return frame, estimator.pose_from_crops(*crops)

    threads = [threading.Thread(target=reader, daemon=True),
               threading.Thread(target=worker, args=(q0, q1, stage1),
                                daemon=True),
               threading.Thread(target=worker, args=(q1, q2, stage2),
                                daemon=True)]
    for t in threads:
        t.start()

    n = 0
    try:
        while True:
            item = q2.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            n += 1
            frame, result = item
            if not lift_and_place(frame, result) or should_stop():
                quit_evt.set()
                break
    finally:
        quit_evt.set()
        # Unblock producers stuck on full queues, then drain.
        for q in (q0, q1, q2):
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
        for t in threads:
            t.join(timeout=5.0)
    return n


def run(args, estimator=None) -> np.ndarray:
    import cv2
    import jax

    from gastx.geometry import normalize_screen_coordinates
    from gastx.infer.streaming import StreamingLifter
    from gastx.models import config_for_frames, init_gastnet
    from gastx.pipeline import revise_skes_real_time
    from gastx.pipeline.keypoint_revision import h36m_coco_kpts
    from gastx.pipeline.video_pose2d import Pose2DEstimator
    from gastx.viz.draw2d import draw_keypoints

    cfg = config_for_frames(args.frames, 17, causal=True, dropout=0.05)
    if args.random_lifter_weights:
        params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    else:
        if args.weight.endswith(".bin"):
            from gastx.io import load_torch_checkpoint, params_from_state_dict
            params, state = params_from_state_dict(
                load_torch_checkpoint(args.weight), cfg)
        else:
            from gastx.train import load_checkpoint
            ts = load_checkpoint(args.weight)["train_state"]
            params, state = ts.params, ts.bn_state

    if estimator is None:
        # Injection point for tests/benches with reduced backbones; the
        # per-frame host loop below stays identical either way.
        estimator = Pose2DEstimator(args.yolo_weights, args.hrnet_weights,
                                    args.yolo_cfg)
    lifter = StreamingLifter(params, state, cfg,
                             num_person=args.num_person)

    source = 0 if args.video == "camera" else args.video
    cap = cv2.VideoCapture(source)
    assert cap.isOpened(), f"cannot open {args.video}"
    width = int(round(cap.get(cv2.CAP_PROP_FRAME_WIDTH)))
    height = int(round(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))

    all_poses = []
    stop = False

    def lift_and_place(frame, result):
        """Per-frame tail: convert -> streaming lift -> realtime placement.

        Shared verbatim by the sequential and pipelined loops; returns
        False to request an early stop (display quit key).
        """
        nonlocal stop
        if result is None:
            return True
        preds, maxvals = result  # (M, 17, 2), (M, 17, 1)

        kpts = np.zeros((args.num_person, 17, 2), np.float32)
        scores = np.zeros((args.num_person, 17, 1), np.float32)
        kpts[:len(preds)] = preds[:args.num_person]
        scores[:len(maxvals)] = maxvals[:args.num_person]

        # per-frame converter + revision (the reference real-time path,
        # tools/utils.py:133-175); refill dropped zero-persons so the
        # streaming window keeps a fixed (num_person, ...) shape
        converted_k, converted_s = h36m_coco_kpts(kpts, scores)
        if not converted_k:
            return True
        frame_kpts = np.zeros((args.num_person, 17, 2), np.float32)
        frame_scores = np.zeros((args.num_person, 17), np.float32)
        nonzero = [p for p in range(args.num_person)
                   if np.sum(kpts[p]) != 0.0]
        for row, p in enumerate(nonzero):
            frame_kpts[p] = converted_k[row]
            frame_scores[p] = converted_s[row]
        norm = np.asarray(normalize_screen_coordinates(
            frame_kpts, w=width, h=height), dtype=np.float32)

        pose3d = lifter.push(norm)  # (M, 17, 3)
        placed = revise_skes_real_time(list(pose3d), frame_kpts, width)
        all_poses.append(placed)

        if args.display:
            overlay = draw_keypoints(frame, frame_kpts, scores=frame_scores)
            cv2.imshow("gastx realtime", overlay)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                stop = True
                return False
        return True

    n = 0
    t0 = time.perf_counter()
    if args.no_pipeline:
        while args.max_frames < 0 or n < args.max_frames:
            ret, frame = cap.read()
            if not ret:
                break
            n += 1
            result = estimator.estimate_frame(frame, args.num_person)
            if not lift_and_place(frame, result):
                break
    else:
        n = _pipelined_loop(cap, estimator, args, lift_and_place,
                            lambda: stop)
    cap.release()

    fps = n / (time.perf_counter() - t0)
    print(f"processed {n} frames at {fps:.1f} fps "
          f"({len(all_poses)} with detections)")

    poses = (np.stack(all_poses) if all_poses
             else np.zeros((0, args.num_person, 17, 3), np.float32))
    if args.output:
        np.savez_compressed(args.output, poses=poses)
        print("saved streamed 3D poses to", args.output)
    return poses


def main(argv=None):
    run(parse_args(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
