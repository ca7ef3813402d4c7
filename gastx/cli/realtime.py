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
    return parser.parse_args(argv)


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
    n = 0
    t0 = time.perf_counter()
    while args.max_frames < 0 or n < args.max_frames:
        ret, frame = cap.read()
        if not ret:
            break
        n += 1

        result = estimator.estimate_frame(frame, args.num_person)
        if result is None:
            continue
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
            continue
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
                break
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
