"""Sliding-window 2D->3D lifting drivers.

Functional parity targets:
  * ``evaluate``+``UnchunkedGenerator`` full-sequence inference with test-time
    flip averaging (reference tools/inference.py:19-41,
    reconstruction.py:148-170, common/generators.py:210-235).
  * ``gen_pose`` post-processing to world coordinates with the demo rotation
    quaternion (tools/inference.py:44-70).

TPU-first design: the whole pipeline — receptive-field edge padding, the
flipped TTA copy, the dilated forward, un-flipping and averaging — is one
jitted function over a fixed-shape batch. Variable-length videos are rounded
up to length buckets (valid temporal convs make trailing edge-pad outputs
exact garbage we trim, so bucketing is numerically exact) so each bucket
compiles once. Multi-person scenes batch along the leading axis instead of
looping sequences like the reference.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gastx.geometry import camera_to_world
from gastx.models.config import GastNetConfig
from gastx.models.gastnet import gastnet_forward
from gastx.skeleton import get_layout

# Hard-coded camera->world rotation used by the in-the-wild demos
# (tools/inference.py:16, reconstruction.py:26).
DEMO_ROT = np.array([0.14070565, -0.15007018, -0.7552408, 0.62232804],
                    dtype=np.float32)

_BUCKET = 64


def _bucket_length(t: int) -> int:
    return max(_BUCKET, ((t + _BUCKET - 1) // _BUCKET) * _BUCKET)


def _perm_from_lr(left, right, n: int) -> np.ndarray:
    """Joint permutation swapping the given left<->right columns (static)."""
    left, right = list(left), list(right)
    perm = np.arange(n)
    perm[left + right] = perm[right + left].copy()
    return perm


def _flip_perm(layout) -> np.ndarray:
    return _perm_from_lr(layout.joints_left, layout.joints_right,
                         layout.num_joints)


@functools.partial(jax.jit, static_argnames=("cfg", "tta", "kps_perm"))
def _lift_batch(params, state, x, cfg: GastNetConfig, tta: bool,
                kps_perm: tuple = None):
    """x: (M, T_padded, J, C_in) -> (M, T_out, J, 3), flip-TTA averaged.

    ``kps_perm``: static left<->right permutation of the 2D INPUT columns.
    The reference flips inputs with the detection file's keypoints_symmetry
    and un-flips outputs with the 3D skeleton's joints_left/right
    (main.py:41-48, common/generators.py:231-233) — the two differ for
    MPII-ordered SH detections. None = the 3D layout's permutation
    (correct whenever the 2D data is in the 3D layout's joint order:
    h36m17/19, the in-the-wild converters, humaneva15).
    """
    layout = get_layout(cfg.layout)
    perm = _flip_perm(layout)
    in_perm = np.asarray(kps_perm) if kps_perm is not None else perm

    if tta:
        # Mirror: negate x coordinate and swap left/right joints
        # (common/generators.py:231-233).
        flipped = x.at[..., 0].multiply(-1.0)[:, :, in_perm]
        x = jnp.concatenate([x, flipped], axis=0)

    y, _ = gastnet_forward(params, state, x, cfg, variant="dilated",
                           train=False)

    if tta:
        # Un-flip the mirrored half and average (tools/inference.py:33-37).
        m = y.shape[0] // 2
        y0, y1 = y[:m], y[m:]
        y1 = y1.at[..., 0].multiply(-1.0)[:, :, perm]
        y = 0.5 * (y0 + y1)
    return y


def lift_sequences(
    params,
    state,
    sequences: Sequence[np.ndarray],
    cfg: GastNetConfig,
    *,
    tta: bool = True,
    mesh=None,
    kps_lr=None,
) -> List[np.ndarray]:
    """Lift normalized 2D keypoint sequences [(T_i, J, C_in)] to
    [(T_i, J, 3)].

    Sequences are edge-padded by the receptive field (asymmetrically when
    causal), grouped into length buckets, and lifted in batched jitted calls.

    ``kps_lr``: optional (kps_left, kps_right) index lists of the 2D
    detections' left/right columns (the keypoints file's
    keypoints_symmetry metadata) used for the TTA input flip when the 2D
    joint order differs from the 3D layout's — e.g. MPII-ordered
    sh_ft_h36m detections. None = the 3D layout's symmetry.

    ``mesh``: optional ``jax.sharding.Mesh`` — serving-style data-parallel
    inference: the per-bucket batch axis is sharded across the mesh and
    params/state are replicated. The forward itself is collective-free;
    with ``tta=True`` (default) the flipped copies are concatenated along
    the sharded batch axis, so the final flip-average does incur a small
    cross-device reshard of the (B, T_out, J, 3) outputs. Results are
    identical to the single-device path.
    """
    rf = cfg.receptive_field()
    pad = (rf - 1) // 2
    shift = pad if cfg.causal else 0

    kps_perm = None
    if kps_lr is not None:
        kps_perm = tuple(int(i) for i in _perm_from_lr(
            kps_lr[0], kps_lr[1], cfg.num_joints_in))

    # Group by bucketed padded length so each shape compiles once.
    jobs = {}
    for i, seq in enumerate(sequences):
        t = seq.shape[0]
        t_pad = t + 2 * pad
        jobs.setdefault(_bucket_length(t_pad), []).append(i)

    if mesh is not None:
        from gastx.parallel import batch_sharding, replicate

        params = replicate(mesh, params)
        state = replicate(mesh, state)

    results: List[Optional[np.ndarray]] = [None] * len(sequences)
    for bucket, idxs in jobs.items():
        batch = []
        for i in idxs:
            seq = np.asarray(sequences[i], dtype=np.float32)
            t = seq.shape[0]
            # Edge padding == clamped index gather; trailing bucket fill
            # repeats the final frame (its outputs are trimmed below).
            gather = np.clip(np.arange(-(pad + shift), bucket - pad - shift),
                             0, t - 1)
            batch.append(seq[gather])
        # Bucket the batch-count axis too (next power of two) so _lift_batch
        # compiles once per (bucket, count-bucket), not per distinct count.
        m = len(batch)
        m_pad = 1 << (m - 1).bit_length()
        if mesh is not None:  # ... and to a multiple of the mesh size
            n_dev = mesh.devices.size
            m_pad = -(-m_pad // n_dev) * n_dev
        batch.extend([np.zeros_like(batch[0])] * (m_pad - m))
        if mesh is not None:
            x = jax.device_put(np.stack(batch), batch_sharding(mesh))
            with mesh:
                y = np.asarray(_lift_batch(params, state, x, cfg, tta,
                                           kps_perm))
        else:
            x = jnp.asarray(np.stack(batch))
            y = np.asarray(_lift_batch(params, state, x, cfg, tta, kps_perm))
        for row, i in enumerate(idxs):
            # np.array: callers mutate predictions (height rebase etc.)
            results[i] = np.array(y[row, :sequences[i].shape[0]])
    return results


def lift_to_world(
    params,
    state,
    sequences: Sequence[np.ndarray],
    cfg: GastNetConfig,
    *,
    tta: bool = True,
    rot: np.ndarray = DEMO_ROT,
    mesh=None,
) -> List[np.ndarray]:
    """Lift + rotate predictions into world coordinates (tools/inference.py:44-70)."""
    preds = lift_sequences(params, state, sequences, cfg, tta=tta, mesh=mesh)
    return [np.array(camera_to_world(p, R=rot, t=0)) for p in preds]
