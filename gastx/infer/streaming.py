"""Real-time causal lifting for streaming keypoints.

Parity target: the reference's real-time path — causal
SpatioTemporalModelOptimized1f checkpoints (gen_skes.py:43-69) driven
per-frame through ``gen_pose_frame`` (tools/inference.py:73-110).

TPU-first design: a device-resident ring of the last receptive-field frames
per person; each :meth:`push` shifts the window and runs ONE jitted strided
forward (input rf frames -> 1 output frame), so steady-state latency is a
single small device step with no host round-trip of history.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models.config import GastNetConfig
from gastx.models.gastnet import gastnet_forward


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stream_step(params, state, window, new_frame, cfg: GastNetConfig):
    """window: (M, RF, J, 2); new_frame: (M, J, 2) -> (new_window, (M, J, 3))."""
    window = jnp.concatenate([window[:, 1:], new_frame[:, None]], axis=1)
    y, _ = gastnet_forward(params, state, window, cfg, variant="strided",
                           train=False)
    return window, y[:, 0]


class StreamingLifter:
    """Push normalized 2D keypoints frame-by-frame, get 3D poses back."""

    def __init__(self, params, state, cfg: GastNetConfig,
                 num_person: int = 1):
        assert cfg.causal, "streaming inference requires a causal model"
        self.params = params
        self.state = state
        self.cfg = cfg
        self.num_person = num_person
        self._window: Optional[jax.Array] = None

    def reset(self) -> None:
        self._window = None

    def push(self, keypoints: np.ndarray) -> np.ndarray:
        """``keypoints``: (M, J, 2) normalized screen coords for the current
        frame. Returns (M, J, 3) root-relative 3D poses. The first frame
        edge-pads the whole window (matching UnchunkedGenerator's leading
        edge padding for causal models)."""
        return np.asarray(self.push_async(keypoints))

    def push_async(self, keypoints: np.ndarray) -> jax.Array:
        """:meth:`push` without the host fetch: returns the (M, J, 3)
        device array while the step may still be in flight. JAX dispatch
        is async, so a caller that defers ``np.asarray`` by one frame
        (gastx/cli/realtime.py pipelined loop) overlaps this frame's
        device/tunnel round-trip with the previous frame's placement —
        the window state advances identically either way."""
        kpts = jnp.asarray(keypoints, dtype=jnp.float32)
        assert kpts.shape == (self.num_person, self.cfg.num_joints_in, 2)
        if self._window is None:
            rf = self.cfg.receptive_field()
            self._window = jnp.broadcast_to(
                kpts[:, None], (self.num_person, rf, *kpts.shape[1:]))
        self._window, pose = _stream_step(self.params, self.state,
                                          self._window, kpts, self.cfg)
        return pose
