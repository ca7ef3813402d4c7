"""Perf lab 9: realtime host-loop stage attribution.

bench.py --full reports end-to-end realtime FPS; this lab breaks one
frame-loop iteration into its stages (decode, YOLO detect, SORT, crop,
HRNet+decode, keypoint conversion, stream-lift) to identify the host
bottleneck, steady-state after jit warmup. On this host each device
dispatch carries ~30 ms of axon-tunnel RTT, so the three device stages
(YOLO, HRNet, lift) are expected to dominate at ~RTT each — a tunnel
floor, not chip time (the chained-scan streaming metric shows the lift
step itself is ~0.3 ms).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab9.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

N_FRAMES = 40


def main():
    import cv2
    import jax

    import bench
    from gastx.geometry import normalize_screen_coordinates
    from gastx.infer.streaming import StreamingLifter
    from gastx.models import config_for_frames, init_gastnet
    from gastx.pipeline import revise_skes_real_time
    from gastx.pipeline.hrnet import get_final_preds, preprocess_boxes
    from gastx.pipeline.keypoint_revision import h36m_coco_kpts

    built = bench.build_tiny_realtime(N_FRAMES)
    assert built is not None, "needs /root/reference for tiny HRNet"
    clip, est, (w, h) = built

    cfg = config_for_frames(27, 17, causal=True, dropout=0.05)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    lifter = StreamingLifter(params, state, cfg, num_person=1)

    stages = {k: 0.0 for k in ("decode", "detect", "track", "crop",
                               "hrnet", "convert", "lift")}
    counts = {k: 0 for k in stages}

    def timed(key, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        stages[key] += time.perf_counter() - t0
        counts[key] += 1
        return out

    for warmup in (True, False):
        cap = cv2.VideoCapture(clip)
        if not warmup:
            for k in stages:
                stages[k] = 0.0
                counts[k] = 0
        while True:
            t0 = time.perf_counter()
            ret, frame = cap.read()
            stages["decode"] += time.perf_counter() - t0
            counts["decode"] += 1
            if not ret:
                break

            dets = timed("detect", est.detector.detect, frame)
            bboxs, det_scores = dets
            if bboxs is None or not bboxs.any():
                continue
            tracks = timed("track", est.tracker.update,
                           np.concatenate([bboxs, det_scores], axis=1))
            if tracks.shape[0] < 1:
                continue
            boxes = [[round(float(v), 2) for v in tracks[-1, :-1]]]

            inputs, centers, scales = timed(
                "crop", preprocess_boxes, frame, boxes, est.image_size, 1)
            inputs = inputs[..., ::-1].copy()

            def hrnet_stage():
                hm = np.asarray(est._hrnet(est.hrnet_params, inputs))
                hm = np.transpose(hm, (0, 3, 1, 2))
                return get_final_preds(hm, np.asarray(centers),
                                       np.asarray(scales))

            preds, maxvals = timed("hrnet", hrnet_stage)

            def convert_stage():
                kpts = preds[:1].astype(np.float32)
                scores = maxvals[:1].astype(np.float32)
                ck, cs = h36m_coco_kpts(kpts, scores)
                if not ck:
                    return None
                fk = np.asarray(ck, np.float32).reshape(1, 17, 2)
                return fk, np.asarray(normalize_screen_coordinates(
                    fk, w=w, h=h), dtype=np.float32)

            converted = timed("convert", convert_stage)
            if converted is None:
                continue
            frame_kpts, norm = converted

            def lift_stage():
                pose = lifter.push(norm)
                # pixel-space keypoints, like the real loop
                # (gastx/cli/realtime.py:124)
                return revise_skes_real_time(list(pose), frame_kpts, w)

            timed("lift", lift_stage)
        cap.release()

    import shutil
    shutil.rmtree(os.path.dirname(clip), ignore_errors=True)

    total = sum(stages.values())
    print(f"\nstage attribution over {counts['decode']} frames "
          f"(steady-state):")
    for k, v in sorted(stages.items(), key=lambda kv: -kv[1]):
        per = v / max(counts[k], 1) * 1000
        print(f"  {k:8s} {v:6.2f}s total  {per:7.2f} ms/frame "
              f"({100 * v / total:4.1f}%)")
    print(f"  e2e      {total:6.2f}s -> {counts['decode'] / total:.1f} fps")


if __name__ == "__main__":
    main()
