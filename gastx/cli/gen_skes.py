"""In-the-wild video -> 3D skeletons: the full pipeline CLI.

Parity target: reference ``gen_skes.py`` — YOLOv3 person detection -> SORT
tracking -> HRNet 2D pose -> COCO->H36M conversion + low-confidence revision
-> GAST-Net lifting with TTA -> pseudo-trajectory / two-person placement ->
animation or compressed npz output.

Usage (mirrors gen_skes.py:163-180)::

    python -m gastx.cli.gen_skes -v baseball.mp4 -np 1 --animation \
        --yolo-weights checkpoint/yolov3/yolov3.weights \
        --hrnet-weights checkpoint/hrnet/pose_hrnet_w48_384x288.pth \
        -w checkpoint/gastnet/27_frame_model.bin

Model weights are the same published files the reference uses.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="gastx in-the-wild 3D pose")
    parser.add_argument("-v", "--video", type=str, required=True,
                        help="input video path")
    parser.add_argument("-np", "--num-person", type=int, default=1,
                        help="number of people to estimate (1 or 2)")
    parser.add_argument("-f", "--frames", type=int, default=27,
                        help="lifting receptive field (27/81/243)")
    parser.add_argument("-ca", "--causal", action="store_true",
                        help="causal (real-time) lifting model")
    parser.add_argument("-w", "--weight", type=str,
                        default="./checkpoint/gastnet/27_frame_model.bin",
                        help="GAST-Net weights (.bin or .ckpt)")
    parser.add_argument("--yolo-weights", type=str,
                        default="./checkpoint/yolov3/yolov3.weights")
    parser.add_argument("--yolo-cfg", type=str, default=None,
                        help="optional darknet cfg (built-in YOLOv3 spec "
                             "used when omitted)")
    parser.add_argument("--hrnet-weights", type=str,
                        default="./checkpoint/hrnet/pose_hrnet_w48_384x288.pth")
    parser.add_argument("-a", "--animation", action="store_true",
                        help="render an output animation")
    parser.add_argument("-o", "--output-dir", type=str, default="./output")
    parser.add_argument("--random-lifter-weights", action="store_true",
                        help="random GAST-Net weights (pipeline smoke test)")
    parser.add_argument("--det-batch", type=int, default=1,
                        help="frames per batched 2D-pipeline dispatch "
                             "(YOLO once + HRNet once per chunk, a large "
                             "offline speedup; default 1 = the reference's "
                             "per-frame loop, bit-exact to it — batched "
                             "convs can differ in the last float bit)")
    return parser.parse_args(argv)


def generate_skeletons(args) -> np.ndarray:
    import cv2
    import jax

    from gastx.infer import lift_to_world
    from gastx.models import config_for_frames, init_gastnet
    from gastx.geometry import normalize_screen_coordinates
    from gastx.pipeline import h36m_coco_format, revise_kpts, revise_skes
    from gastx.pipeline.video_pose2d import gen_video_kpts

    cap = cv2.VideoCapture(args.video)
    width = int(round(cap.get(cv2.CAP_PROP_FRAME_WIDTH)))
    height = int(round(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
    cap.release()

    keypoints, scores = gen_video_kpts(
        args.video, args.yolo_weights, args.hrnet_weights,
        num_person=args.num_person, yolo_cfg=args.yolo_cfg,
        batch_size=getattr(args, "det_batch", 1))

    h36m_kpts, h36m_scores, valid_frames = h36m_coco_format(keypoints,
                                                            scores)
    re_kpts = revise_kpts(h36m_kpts, h36m_scores, valid_frames)
    print(f"INFO: detected {len(re_kpts)} person(s)")

    cfg = config_for_frames(args.frames, 17, causal=args.causal,
                            dropout=0.05)
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

    print("Generating 3D human pose ...")
    norm_seqs = [
        np.asarray(normalize_screen_coordinates(
            re_kpts[i, frames], w=width, h=height), dtype=np.float32)
        for i, frames in enumerate(valid_frames)
    ]
    predictions = lift_to_world(params, state, norm_seqs, cfg, tta=True)

    # Pseudo-trajectory + inter-person placement only for 2-person scenes;
    # single-person output just rebases the height (gen_skes.py:133-138).
    if len(predictions) == 2:
        full_pred = revise_skes(predictions, re_kpts, valid_frames)
    else:
        full_pred = np.zeros((len(predictions), re_kpts.shape[1], 17, 3),
                             dtype=np.float32)
        for i, frames in enumerate(valid_frames):
            pred = predictions[i]
            pred[:, :, 2] -= np.amin(pred[:, :, 2])
            full_pred[i, frames] = pred

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.video))[0]

    if args.animation:
        from gastx.skeleton import H36M_17
        from gastx.viz import render_animation_multiperson

        keypoints_metadata = {
            "keypoints_symmetry": (list(H36M_17.joints_left),
                                   list(H36M_17.joints_right)),
            "layout_name": "Human3.6M", "num_joints": 17}
        out = os.path.join(args.output_dir, base + "_3d.mp4")
        print("Rendering animation to", out)
        render_animation_multiperson(
            re_kpts, keypoints_metadata, list(full_pred), H36M_17.skeleton(),
            25, 3000, np.float32(70.0), out, viewport=(width, height),
            input_video_path=args.video)
    else:
        out = os.path.join(args.output_dir, base + "_3d.npz")
        np.savez_compressed(out, reconstruction=full_pred)
        print("Saved 3D skeletons to", out)
    return full_pred


def main(argv=None):
    generate_skeletons(parse_args(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
