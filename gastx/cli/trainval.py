"""Train / evaluate GastNet on Human3.6M / HumanEva.

Parity target: the reference trainval.py script body — epoch loop with
Adam(amsgrad) + x0.95/epoch decay, per-epoch valid/train-eval losses, best
checkpoint on valid MPJPE < 49.5mm, periodic checkpoints with resumable
batcher RNG, final action-wise Protocol #1/#2 evaluation with TTA, and the
--render branch.

TPU redesign: one jitted strided train step over a data-parallel mesh;
fixed-shape batches (ragged tails padded with zero-weight samples); eval via
length-bucketed batched inference. Usage mirrors the reference, e.g.::

    python -m gastx.cli.trainval -e 80 -k cpn_ft_h36m_dbb -arc 3,3,3 -b 128
    python -m gastx.cli.trainval -k cpn_ft_h36m_dbb --evaluate epoch_best.ckpt
"""
from __future__ import annotations

import os
import sys
from time import time

import numpy as np

from gastx.cli.arguments import parse_args
from gastx.data.generators import ChunkedBatcher
from gastx.data.harness import fetch, group_actions_by_name, load_data
from gastx.eval.protocol import evaluate_sequences, run_evaluation
from gastx.models import GastNetConfig, init_gastnet, param_count


def build_config(args, dataset, in_features: int = 2) -> GastNetConfig:
    """``in_features`` follows the 2D data's channel count — 2 for plain
    keypoints, 3 when detections carry confidence scores (the reference takes
    it from poses_valid_2d, main.py:166-171)."""
    filter_widths = tuple(int(x) for x in args.architecture.split(","))
    num_joints = dataset.skeleton().num_joints()
    layout = {17: "h36m17", 16: "sh16", 15: "humaneva15",
              19: "h36m19"}[num_joints]
    tier = getattr(args, "matmul_precision", "high")
    if tier == "mixed":
        from gastx.models.config import TPU_MIXED_PRECISION_OVERRIDES
        precision, overrides = "high", TPU_MIXED_PRECISION_OVERRIDES
    else:
        precision, overrides = tier, ()
    return GastNetConfig(
        num_joints_in=num_joints, in_features=in_features,
        num_joints_out=num_joints, filter_widths=filter_widths,
        channels=args.channels, dropout=args.dropout, causal=args.causal,
        layout=layout, matmul_precision=precision,
        precision_overrides=overrides)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from gastx.parallel import make_mesh, replicate, shard_batch
    from gastx.train import (init_train_state, load_checkpoint,
                             make_train_step, restore_batcher_random_state,
                             save_checkpoint)

    args = parse_args(argv)
    print(args)
    os.makedirs(args.checkpoint, exist_ok=True)

    (keypoints, dataset, keypoints_metadata, kps_left, kps_right,
     joints_left, joints_right) = load_data(args.dataset, args.keypoints,
                                            args.data_dir)

    subjects_train = args.subjects_train.split(",")
    subjects_test = ([args.viz_subject] if args.render
                     else args.subjects_test.split(","))
    action_filter = None if args.actions == "*" else args.actions.split(",")
    if action_filter is not None:
        print("Selected actions:", action_filter)

    cameras_valid, poses_valid, poses_valid_2d = fetch(
        subjects_test, action_filter, dataset, keypoints, args.downsample)

    cfg = build_config(args, dataset,
                       in_features=poses_valid_2d[0].shape[-1])
    rf = cfg.receptive_field()
    pad = (rf - 1) // 2
    print(f"INFO: Receptive field: {rf} frames")
    if args.causal:
        print("INFO: Using causal convolutions")

    params, bn_state = init_gastnet(jax.random.PRNGKey(0), cfg)
    print("INFO: Trainable parameter count:", param_count(params))

    mesh = make_mesh()
    print(f"INFO: data-parallel mesh over {mesh.devices.size} device(s)")

    # The strided variant trains stride-1 chunks without waste
    # (main.py:166-171); fall back to dilated otherwise.
    train_variant = ("strided" if args.stride == 1
                     and not args.disable_optimizations else "dilated")

    epoch = 0
    lr = args.learning_rate
    batcher_rng = None
    ts = None
    if args.resume or args.evaluate:
        path = os.path.join(args.checkpoint,
                            args.resume if args.resume else args.evaluate)
        print("Loading checkpoint", path)
        if path.endswith(".bin"):
            # Reference torch checkpoint interchange.
            from gastx.io import load_torch_checkpoint, params_from_state_dict
            params, bn_state = params_from_state_dict(
                load_torch_checkpoint(path), cfg)
        else:
            blob = load_checkpoint(path)
            ts = blob["train_state"]
            params, bn_state = ts.params, ts.bn_state
            if args.resume:
                epoch = blob["epoch"]
                lr = blob["lr"]
                batcher_rng = restore_batcher_random_state(blob)

    if not args.evaluate:
        cameras_train, poses_train, poses_train_2d = fetch(
            subjects_train, action_filter, dataset, keypoints,
            args.downsample, subset=args.subset)

        train_batcher = ChunkedBatcher(
            args.batch_size // args.stride, cameras_train, poses_train,
            poses_train_2d, args.stride, pad=pad,
            causal_shift=pad if args.causal else 0, shuffle=True,
            augment=args.data_augmentation, kps_left=kps_left,
            kps_right=kps_right, joints_left=joints_left,
            joints_right=joints_right)
        if batcher_rng is not None:
            train_batcher.set_random_state(batcher_rng)
        print(f"INFO: Training on {train_batcher.num_frames()} frames")

        if ts is None:
            ts = init_train_state(params, bn_state)
        ts = replicate(mesh, ts)
        step = make_train_step(cfg, variant=train_variant)

        from gastx.utils import MetricLogger, capture_trace, trace as prof
        metric_log = MetricLogger(args.log_file or None)

        losses_train, losses_train_eval, losses_valid = [], [], []
        loss_min = 49.5
        full_batch = args.batch_size // args.stride

        while epoch < args.epochs:
            start_time = time()
            loss_sum, n_frames = 0.0, 0
            n_dev = mesh.devices.size
            # one fixed shape for every batch: full_batch rounded up to the
            # mesh size, so shard_batch never injects weight-1 duplicates
            padded_batch = -(-full_batch // n_dev) * n_dev

            def prepare(batch):
                # pad ragged tails with zero-weight samples; stage on device
                _, batch_3d, batch_2d = batch
                b = batch_2d.shape[0]
                weights = np.zeros(padded_batch, np.float32)
                weights[:b] = 1.0
                if b < padded_batch:
                    reps = padded_batch - b
                    batch_2d = np.concatenate(
                        [batch_2d, np.repeat(batch_2d[-1:], reps, 0)])
                    batch_3d = np.concatenate(
                        [batch_3d, np.repeat(batch_3d[-1:], reps, 0)])
                (b2, b3, w), _ = shard_batch(
                    mesh, batch_2d.astype(np.float32),
                    batch_3d.astype(np.float32), weights)
                return b2, b3, w, b

            from gastx.data.prefetch import prefetch_to_device

            profile_dir = (args.profile_dir or None) if epoch == 0 else None
            with capture_trace(profile_dir), mesh:
                # double-buffered: next batch assembles + stages while the
                # current step runs (SURVEY.md §2.7)
                for bi, (b2, b3, w, b) in enumerate(prefetch_to_device(
                        train_batcher.next_epoch(), prepare)):
                    with prof("train_step"):
                        ts, loss = step(ts, b2, b3, w, jnp.float32(lr),
                                        jax.random.fold_in(
                                            jax.random.PRNGKey(epoch), bi))
                    frames = b * args.stride
                    loss_sum += float(loss) * frames
                    n_frames += frames
            losses_train.append(loss_sum / n_frames)

            if not args.no_eval:
                host_params = jax.device_get(ts.params)
                host_bn = jax.device_get(ts.bn_state)
                e_valid, _ = evaluate_sequences(
                    host_params, host_bn, poses_valid_2d, poses_valid, cfg,
                    tta=False, compute_p2=False)
                e_train, _ = evaluate_sequences(
                    host_params, host_bn, poses_train_2d, poses_train, cfg,
                    tta=False, compute_p2=False)
                losses_valid.append(e_valid / 1000)
                losses_train_eval.append(e_train / 1000)

            elapsed = (time() - start_time) / 60
            metric_log.log(
                epoch + 1, lr=lr, epoch_minutes=round(elapsed, 3),
                train_mpjpe_mm=losses_train[-1] * 1000,
                train_eval_mpjpe_mm=(losses_train_eval[-1] * 1000
                                     if losses_train_eval else None),
                valid_mpjpe_mm=(losses_valid[-1] * 1000
                                if losses_valid else None))
            if args.no_eval:
                print(f"[{epoch + 1}] time {elapsed:.2f} lr {lr:f} "
                      f"3d_train {losses_train[-1] * 1000:f}")
            else:
                print(f"[{epoch + 1}] time {elapsed:.2f} lr {lr:f} "
                      f"3d_train {losses_train[-1] * 1000:f} "
                      f"3d_eval {losses_train_eval[-1] * 1000:f} "
                      f"3d_valid {losses_valid[-1] * 1000:f}")
                if losses_valid[-1] * 1000 < loss_min:
                    chk_path = os.path.join(args.checkpoint,
                                            "epoch_best.ckpt")
                    print("Saving checkpoint to", chk_path)
                    save_checkpoint(
                        chk_path, epoch=epoch, lr=lr,
                        train_state=jax.device_get(ts),
                        batcher_random_state=train_batcher.random_state())
                    loss_min = losses_valid[-1] * 1000

            lr *= args.lr_decay
            epoch += 1

            if epoch % args.checkpoint_frequency == 0:
                chk_path = os.path.join(args.checkpoint,
                                        f"epoch_{epoch}.ckpt")
                print("Saving checkpoint to", chk_path)
                save_checkpoint(
                    chk_path, epoch=epoch, lr=lr,
                    train_state=jax.device_get(ts),
                    batcher_random_state=train_batcher.random_state())

            if args.export_training_curves and epoch > 3:
                from gastx.utils import export_training_curves
                export_training_curves(
                    os.path.join(args.checkpoint, "loss_3d.png"),
                    losses_train, losses_train_eval, losses_valid)

        params = jax.device_get(ts.params)
        bn_state = jax.device_get(ts.bn_state)

    # ---- final evaluation / rendering ----
    if args.render:
        print("Rendering...")
        input_keypoints = keypoints[args.viz_subject][args.viz_action][
            args.viz_camera].copy()
        ground_truth = None
        if (args.viz_subject in dataset.subjects()
                and args.viz_action in dataset[args.viz_subject]):
            if "positions_3d" in dataset[args.viz_subject][args.viz_action]:
                ground_truth = dataset[args.viz_subject][args.viz_action][
                    "positions_3d"][args.viz_camera].copy()
        if ground_truth is None:
            print("INFO: this action is unlabeled. Ground truth will not be "
                  "rendered.")

        from gastx.infer import lift_sequences
        # Full channel count: cfg.in_features follows the detections (2, or
        # 3 with confidence), so no [..., :2] slice (main.py:166-171).
        prediction = lift_sequences(
            params, bn_state, [input_keypoints], cfg,
            tta=args.test_time_augmentation,
            kps_lr=(kps_left, kps_right))[0]

        if args.viz_export is not None:
            print("Exporting joint positions to", args.viz_export)
            np.save(args.viz_export, prediction)

        if args.viz_output is not None:
            from gastx.geometry import camera_to_world, image_coordinates
            cam = dataset.cameras()[args.viz_subject][args.viz_camera]
            if ground_truth is not None:
                trajectory = ground_truth[:, :1]
                ground_truth[:, 1:] += trajectory
                prediction += trajectory
                prediction = np.array(camera_to_world(
                    prediction, R=cam["orientation"], t=cam["translation"]))
                ground_truth = np.array(camera_to_world(
                    ground_truth, R=cam["orientation"], t=cam["translation"]))
            else:
                rot = next(
                    c[args.viz_camera]["orientation"]
                    for c in dataset.cameras().values()
                    if "orientation" in c[args.viz_camera])
                prediction = np.array(camera_to_world(prediction, R=rot, t=0))
                prediction[:, :, 2] -= np.min(prediction[:, :, 2])

            anim_output = {"Reconstruction": prediction}
            if ground_truth is not None and not args.viz_no_ground_truth:
                anim_output["Ground truth"] = ground_truth

            input_keypoints = np.asarray(image_coordinates(
                input_keypoints[..., :2], w=cam["res_w"], h=cam["res_h"]))

            from gastx.viz.animation import render_animation
            render_animation(
                input_keypoints, keypoints_metadata, anim_output,
                dataset.skeleton(), dataset.fps(), args.viz_bitrate,
                cam["azimuth"], args.viz_output, limit=args.viz_limit,
                downsample=args.viz_downsample, size=args.viz_size,
                input_video_path=args.viz_video,
                viewport=(cam["res_w"], cam["res_h"]),
                input_video_skip=args.viz_skip)
    else:
        print("Evaluating...")
        all_actions, by_subject = group_actions_by_name(dataset,
                                                        subjects_test)
        if not args.by_subject:
            run_evaluation(params, bn_state, all_actions, dataset, keypoints,
                           cfg, downsample=args.downsample,
                           tta=args.test_time_augmentation,
                           action_filter=action_filter,
                           kps_lr=(kps_left, kps_right))
        else:
            for subject in by_subject:
                print("Evaluating on subject", subject)
                run_evaluation(params, bn_state, by_subject[subject],
                               dataset, keypoints, cfg,
                               downsample=args.downsample,
                               tta=args.test_time_augmentation,
                               action_filter=action_filter,
                               kps_lr=(kps_left, kps_right))
                print("")


if __name__ == "__main__":
    main(sys.argv[1:])
