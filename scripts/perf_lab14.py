"""Perf lab 14: offline 2D-pipeline throughput — per-frame vs batched.

The offline driver (gen_skes / gen_video_kpts) historically ran the
2D stage once per frame: 2 device dispatches (YOLO, HRNet) x ~30 ms
tunnel RTT each. The batched mode (gen_video_kpts(batch_size=N) ->
Pose2DEstimator.estimate_batch) runs ONE stacked YOLO dispatch and ONE
padded HRNet dispatch per N-frame chunk, so the per-frame dispatch cost
amortizes ~N-fold while SORT still updates in frame order (parity test:
tests/test_video_pipeline_e2e.py::test_gen_video_kpts_batched_matches_per_frame).

This lab measures end-to-end gen_video_kpts fps (decode included) over a
synthetic clip with the reduced backbones at batch 1 / 4 / 16 / 32, one
warmup pass each (jit compiles excluded from timing).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab14.py

Measured (2026-08-17, axon v5e tunnel, 96-frame clip, tiny backbones):

  det-batch  1:  14.8 frames/s   (the per-frame loop)
  det-batch  4:  33.3 frames/s
  det-batch 16:  48.2 frames/s
  det-batch 32:  52.1 frames/s   (3.5x; flattening toward the host-side
                                  decode/SORT/crop + per-chunk RTT floor)
"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root bench.py: tiny-backbone builder)

N_FRAMES = 96


def main():
    built = bench.build_tiny_realtime(N_FRAMES)
    if built is None:
        print("reference unavailable; nothing to measure")
        return
    clip, est, _ = built

    from gastx.pipeline.sort import Sort
    from gastx.pipeline.video_pose2d import gen_video_kpts

    try:
        for batch in (1, 4, 16, 32):
            # Warmup pass absorbs the jit compiles for this chunk shape.
            for timed in (False, True):
                est.tracker = Sort()  # cold tracker per pass
                t0 = time.perf_counter()
                kpts, _ = gen_video_kpts(clip, "unused", "unused",
                                         num_person=1, progress=False,
                                         estimator=est, batch_size=batch)
                dt = time.perf_counter() - t0
                # Pin the denominator: a frame with no detection would
                # silently deflate frames/s and skew the batch sweep.
                assert kpts.shape[1] == N_FRAMES, \
                    f"only {kpts.shape[1]}/{N_FRAMES} frames detected"
                if timed:
                    print(f"[det-batch {batch:3d}] "
                          f"{N_FRAMES / dt:6.1f} frames/s "
                          f"({dt:.1f}s for {N_FRAMES} frames)",
                          flush=True)
    finally:
        shutil.rmtree(os.path.dirname(clip), ignore_errors=True)


if __name__ == "__main__":
    main()
