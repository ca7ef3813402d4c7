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
    parser.add_argument("--pool-workers", type=int, default=2,
                        help="worker threads for the stateless pipeline "
                             "stages (device detect, HRNet 2D): "
                             "neighbouring frames' dispatches of the SAME "
                             "stage overlap; 1 = one thread per stage. "
                             "Outputs are identical either way")
    return parser.parse_args(argv)


def _pipelined_loop(cap, estimator, args, lift_submit, lift_finish,
                    should_stop, depth: int = 4,
                    pool_workers: int = 2) -> int:
    """Software-pipelined frame loop with pooled stateless stages.

    Per frame the host loop performs three device dispatches — YOLO
    detect, HRNet 2D pose, causal streaming lift — each costing a fixed
    tunnel/dispatch round-trip on top of sub-ms chip time. Run
    sequentially they serialize (the measured 5.8 fps floor of
    scripts/perf_lab9.py); pipelined across NEIGHBOURING frames the
    round-trips overlap, so steady-state throughput approaches the
    slowest single stage instead of the sum. The slowest stage is the
    detect dispatch (~2 tunnel RTTs), and its device half is STATELESS —
    only the SORT update needs frame order — so it additionally runs on a
    ``pool_workers``-wide thread pool whose deliverer releases results in
    sequence order; the HRNet stage (also stateless) is pooled the same
    way. Pooling overlaps the same stage's round-trips for NEIGHBOURING
    frames on top of the cross-stage overlap.

    Stages (FIFO queues of ``depth``; every queue item is ``(seq,
    payload)`` and a ``STOP`` payload flushes the pipe):

      reader:      cap.read                      (ordered tagger)
      device det:  letterbox + YOLO dispatch     (POOLED, ordered delivery)
      track:       SORT update + affine crops    (ordered: owns tracker)
      hrnet:       HRNet heatmaps + decode       (POOLED, ordered delivery)
      main:        convert + stream-lift + place (ordered: owns the
                   lifter window state; ``lift_submit`` dispatches the
                   lift async and ``lift_finish`` of the PREVIOUS frame
                   fetches/places while it is in flight — a 1-deep
                   software pipeline inside the main stage)

    The pooled split needs the estimator's device/host detect split
    (``.detector.detect`` + ``.crops_from_detections``); estimators
    without it (reduced test stubs) fall back to an ordered
    ``detect_crops`` stage. Every stateful stage processes frames
    strictly in order, so tracker and streaming-lifter state evolve
    exactly as in the sequential loop and the output npz is bit-identical
    (tests/test_realtime_cli.py + the deep-split parity test in
    tests/test_video_pipeline_e2e.py assert it). Exceptions ride the
    queues tagged with their frame and re-raise in the caller, in order.
    """
    import queue
    import threading

    STOP = object()
    quit_evt = threading.Event()
    queues = []

    def make_queue():
        q = queue.Queue(maxsize=depth)
        queues.append(q)
        return q

    def safe_put(q, item):
        """put that gives up once the pipeline is shutting down — the
        main thread drains each queue exactly once in its ``finally``,
        so a put racing past that drain could otherwise block a stage
        thread forever (a leak for long-running library callers)."""
        while not quit_evt.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def reader(q_out):
        n = 0
        while not quit_evt.is_set() and (args.max_frames < 0
                                         or n < args.max_frames):
            ret, frame = cap.read()
            if not ret:
                break
            if not safe_put(q_out, (n, frame)):
                return
            n += 1
        safe_put(q_out, (n, STOP))

    def ordered_stage(q_in, q_out, fn):
        """One worker, FIFO in == FIFO out; exceptions pass through."""
        while not quit_evt.is_set():
            seq, item = q_in.get()
            if item is STOP or quit_evt.is_set():
                safe_put(q_out, (seq, STOP))
                return
            if isinstance(item, BaseException):
                safe_put(q_out, (seq, item))
                continue
            try:
                res = fn(item)
            except BaseException as exc:
                res = exc
            if not safe_put(q_out, (seq, res)):
                return

    def pooled_stage(q_in, q_out, fn, workers):
        """``workers`` concurrent appliers of a STATELESS ``fn`` plus a
        deliverer that releases results in sequence order — downstream
        stateful stages see exactly the sequential stream."""
        cond = threading.Condition()
        buf = {}

        def work():
            while not quit_evt.is_set():
                seq, item = q_in.get()
                if item is STOP or quit_evt.is_set():
                    try:
                        q_in.put_nowait((seq, STOP))  # wake peer workers
                    except queue.Full:
                        pass  # full queue == a peer isn't blocked on get
                    with cond:
                        buf[seq] = STOP
                        cond.notify_all()
                    return
                if isinstance(item, BaseException):
                    res = item
                else:
                    try:
                        res = fn(item)
                    except BaseException as exc:
                        res = exc
                with cond:
                    buf[seq] = res
                    cond.notify_all()

        ABSENT = object()

        def deliver():
            want = 0
            while not quit_evt.is_set():
                with cond:
                    while want not in buf and not quit_evt.is_set():
                        cond.wait(0.2)
                    # Distinct sentinel: a stage fn legitimately returning
                    # None must not read as the quit_evt path.
                    res = buf.pop(want, ABSENT)
                if res is ABSENT:  # quit_evt path
                    return
                if not safe_put(q_out, (want, res)) or res is STOP:
                    return
                want += 1

        return [threading.Thread(target=work, daemon=True)
                for _ in range(workers)] \
            + [threading.Thread(target=deliver, daemon=True)]

    q0 = make_queue()
    q_crops = make_queue()
    q_pose = make_queue()
    threads = [threading.Thread(target=reader, args=(q0,), daemon=True)]

    deep_split = pool_workers > 1 and hasattr(estimator, "detector") \
        and hasattr(estimator, "crops_from_detections")
    if deep_split:
        q_dets = make_queue()
        threads += pooled_stage(
            q0, q_dets,
            lambda frame: (frame, estimator.detector.detect(frame)),
            pool_workers)

        def track_stage(item):
            frame, (bboxs, det_scores) = item
            return frame, estimator.crops_from_detections(
                frame, bboxs, det_scores, args.num_person, True)

        threads.append(threading.Thread(
            target=ordered_stage, args=(q_dets, q_crops, track_stage),
            daemon=True))
    else:
        threads.append(threading.Thread(
            target=ordered_stage,
            args=(q0, q_crops,
                  lambda frame: (frame, estimator.detect_crops(
                      frame, args.num_person))),
            daemon=True))

    def hrnet_stage(item):
        frame, crops = item
        if crops is None:
            return frame, None
        return frame, estimator.pose_from_crops(*crops)

    if pool_workers > 1:
        threads += pooled_stage(q_crops, q_pose, hrnet_stage, pool_workers)
    else:
        threads.append(threading.Thread(
            target=ordered_stage, args=(q_crops, q_pose, hrnet_stage),
            daemon=True))

    for t in threads:
        t.start()

    n = 0
    pending = None
    try:
        while True:
            _, item = q_pose.get()
            if item is STOP:
                break
            if isinstance(item, BaseException):
                # Place the already-submitted previous frame first, so an
                # error-tolerant caller sees exactly the sequential
                # prefix of outputs.
                if pending is not None:
                    lift_finish(pending)
                    pending = None
                raise item
            n += 1
            frame, result = item
            # Submit this frame's lift before finishing the previous
            # frame: the new dispatch's round-trip overlaps the fetch.
            submitted = lift_submit(frame, result)
            if pending is not None and not lift_finish(pending):
                # Early display-quit: drop the in-flight frame, like the
                # sequential loop (which never reads or submits it) —
                # including from the processed-frame count.
                pending = None
                n -= 1
                quit_evt.set()
                break
            pending = submitted
            if should_stop():
                quit_evt.set()
                break
        if pending is not None:
            lift_finish(pending)
            pending = None
    finally:
        quit_evt.set()
        # Unblock producers stuck on full queues, then wake any getter
        # still blocked on an empty queue (a full queue has no blocked
        # getters, so a dropped sentinel is never a lost wakeup).
        for q in queues:
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            try:
                q.put_nowait((-1, STOP))
            except queue.Full:
                pass
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

    def lift_submit(frame, result):
        """Per-frame head: convert -> ASYNC streaming-lift dispatch.

        Returns a pending token for :func:`lift_finish`, or None for
        frames that never reach the lifter (no detection / empty
        conversion). The window state advances at submit time, so
        submits must happen in frame order.
        """
        if result is None:
            return None
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
            return None
        frame_kpts = np.zeros((args.num_person, 17, 2), np.float32)
        frame_scores = np.zeros((args.num_person, 17), np.float32)
        nonzero = [p for p in range(args.num_person)
                   if np.sum(kpts[p]) != 0.0]
        for row, p in enumerate(nonzero):
            frame_kpts[p] = converted_k[row]
            frame_scores[p] = converted_s[row]
        norm = np.asarray(normalize_screen_coordinates(
            frame_kpts, w=width, h=height), dtype=np.float32)

        return frame, frame_kpts, frame_scores, lifter.push_async(norm)

    def lift_finish(pending):
        """Per-frame tail: fetch the lift result -> placement -> display.

        Returns False to request an early stop (display quit key). The
        pipelined loop holds ONE pending frame so this fetch's tunnel
        round-trip overlaps the next frame's submit; the sequential loop
        finishes each frame immediately (identical math either way).
        """
        nonlocal stop
        frame, frame_kpts, frame_scores, pose_dev = pending
        pose3d = np.asarray(pose_dev)  # (M, 17, 3)
        placed = revise_skes_real_time(list(pose3d), frame_kpts, width)
        all_poses.append(placed)

        if args.display:
            overlay = draw_keypoints(frame, frame_kpts, scores=frame_scores)
            cv2.imshow("gastx realtime", overlay)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                stop = True
                return False
        return True

    def lift_and_place(frame, result):
        """Submit + finish in one step (the sequential loop's tail)."""
        pending = lift_submit(frame, result)
        return lift_finish(pending) if pending is not None else True

    n = 0
    t0 = time.perf_counter()
    try:
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
            n = _pipelined_loop(
                cap, estimator, args, lift_submit, lift_finish,
                lambda: stop,
                pool_workers=getattr(args, "pool_workers", 2))
    finally:
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
