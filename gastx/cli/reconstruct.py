"""Offline 3D reconstruction from precomputed 2D keypoints JSON.

Parity target: reference ``reconstruction.py`` — load a skeleton-JSON 2D
keypoints file, convert layout (coco/mpii/openpose/wholebody/h36m), normalize
to unit screen coordinates, lift with the receptive-field-padded sliding
window + test-time flip averaging, rotate to world coordinates with the demo
quaternion, rebase height, and render the animation.

Usage (flags mirror reconstruction.py:57-78)::

    python -m gastx.cli.reconstruct -w 27_frame_model.bin -n 17 \
        -k ./data/keypoints/baseball.json -kf coco -vi baseball.mp4 \
        -vo ./output/baseball.mp4

Accepts both reference ``.bin`` torch checkpoints (imported through
gastx.io.torch_import) and native ``.ckpt`` files. ``--no-render`` skips the
animation and writes the 3D poses as npz instead.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="gastx reconstruction")
    parser.add_argument("-f", "--frames", type=int, default=27,
                        help="receptive field (27/81/243)")
    parser.add_argument("-ca", "--causal", action="store_true",
                        help="use the causal real-time model")
    parser.add_argument("-w", "--weight", type=str,
                        default="27_frame_model.bin",
                        help="model weight file name")
    parser.add_argument("-n", "--num-joints", type=int, default=17,
                        help="number of joints (17 or 19)")
    parser.add_argument("-k", "--keypoints-file", type=str,
                        default="./data/keypoints/baseball.json")
    parser.add_argument("-vi", "--video-path", type=str,
                        default="./data/video/baseball.mp4")
    parser.add_argument("-vo", "--viz-output", type=str,
                        default="./output/baseball.mp4")
    parser.add_argument("-kf", "--kpts-format", type=str, default="coco",
                        choices=["coco", "mpii", "openpose", "wholebody",
                                 "h36m"])
    parser.add_argument("--checkpoint-dir", type=str,
                        default="./checkpoint/gastnet")
    parser.add_argument("--no-render", action="store_true",
                        help="skip animation; save 3D poses to npz")
    parser.add_argument("--random-weights", action="store_true",
                        help="run with randomly initialized weights "
                             "(pipeline smoke test without a checkpoint)")
    return parser.parse_args(argv)


def load_weights(path: str, cfg):
    import jax

    from gastx.models import init_gastnet

    if path.endswith(".bin"):
        from gastx.io import load_torch_checkpoint, params_from_state_dict
        return params_from_state_dict(load_torch_checkpoint(path), cfg)
    from gastx.train import load_checkpoint
    blob = load_checkpoint(path)
    ts = blob["train_state"]
    return ts.params, ts.bn_state


def reconstruct(args) -> np.ndarray:
    import jax

    from gastx.data import (coco_h36m, coco_h36m_toe_format,
                            load_keypoints_json, mpii_h36m, openpose_to_coco)
    from gastx.geometry import normalize_screen_coordinates
    from gastx.infer import lift_to_world
    from gastx.models import config_for_frames, init_gastnet
    from gastx.skeleton import get_layout

    if not os.path.exists(args.keypoints_file):
        raise SystemExit(f"error: keypoints file not found: "
                         f"{args.keypoints_file}")
    print("Loading 2D keypoints ...")
    keypoints, scores, _, _ = load_keypoints_json(args.keypoints_file,
                                                  args.num_joints)
    keypoints = keypoints[0]  # first person

    if args.kpts_format == "coco":
        keypoints, valid_frames = coco_h36m(keypoints)
    elif args.kpts_format == "mpii":
        keypoints, valid_frames = mpii_h36m(keypoints)
    elif args.kpts_format == "openpose":
        keypoints, valid_frames = coco_h36m(openpose_to_coco(keypoints))
    elif args.kpts_format == "wholebody":
        keypoints, valid_frames = coco_h36m_toe_format(keypoints)
    else:  # h36m
        valid_frames = np.where(
            np.sum(keypoints.reshape(keypoints.shape[0], -1), axis=1)
            != 0)[0]

    # Video resolution for screen normalization (fall back to 1000x1002).
    width, height = 1000, 1002
    if args.video_path and os.path.exists(args.video_path):
        from gastx.viz import get_resolution
        width, height = get_resolution(args.video_path)

    norm_kpts = np.asarray(normalize_screen_coordinates(
        keypoints[..., :2], w=width, h=height), dtype=np.float32)

    cfg = config_for_frames(args.frames, args.num_joints,
                            causal=args.causal, dropout=0.05)
    if args.random_weights:
        from gastx.models import init_gastnet
        params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    else:
        chk_file = (args.weight if os.path.exists(args.weight)
                    else os.path.join(args.checkpoint_dir, args.weight))
        if not os.path.exists(chk_file):
            raise SystemExit(
                f"error: checkpoint not found: {chk_file} (download the "
                f"published weights or pass --random-weights for a smoke "
                f"test)")
        print("Loading checkpoint", chk_file)
        params, state = load_weights(chk_file, cfg)

    print("Reconstructing ...")
    prediction = lift_to_world(params, state, [norm_kpts[valid_frames]],
                               cfg, tta=True)[0]
    prediction[:, :, 2] -= np.min(prediction[:, :, 2])  # rebase height

    prediction_full = np.zeros((keypoints.shape[0], args.num_joints, 3),
                               dtype=np.float32)
    prediction_full[valid_frames] = prediction

    if args.no_render:
        out = os.path.splitext(args.viz_output)[0] + ".npz"
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        np.savez_compressed(out, reconstruction=prediction_full)
        print("Saved 3D poses to", out)
        return prediction_full

    print("Rendering ...")
    layout = get_layout(args.num_joints)
    keypoints_metadata = {
        "keypoints_symmetry": (list(layout.joints_left),
                               list(layout.joints_right)),
        "layout_name": "Human3.6M",
        "num_joints": args.num_joints,
    }
    from gastx.viz import render_animation
    os.makedirs(os.path.dirname(args.viz_output) or ".", exist_ok=True)
    render_animation(
        keypoints, keypoints_metadata, {"Reconstruction": prediction_full},
        layout.skeleton(), 25, 3000, np.float32(70.0), args.viz_output,
        viewport=(width, height), limit=-1, downsample=1, size=5,
        input_video_path=(args.video_path
                          if args.video_path
                          and os.path.exists(args.video_path) else None),
        input_video_skip=0)
    return prediction_full


def main(argv=None):
    reconstruct(parse_args(argv))


if __name__ == "__main__":
    main(sys.argv[1:])
