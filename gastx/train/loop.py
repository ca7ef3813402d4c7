"""Jitted SPMD training / evaluation steps.

Parity targets: the train epoch of main.py:213-243 (root-zeroed targets,
mpjpe loss, Adam step) and the eval paths of main.py:246-353 (eval-mode
forward, test-time flip averaging). The reference's per-batch
numpy->cuda->DataParallel flow becomes: host batch assembly
(data.generators) -> ``shard_batch`` device_put over the mesh -> one jitted
step in which XLA inserts the gradient/BN psum collectives.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gastx.eval.metrics import mpjpe
from gastx.models.config import GastNetConfig
from gastx.models.gastnet import gastnet_forward
from gastx.train.optimizer import scale_by_amsgrad


class TrainState(NamedTuple):
    params: Dict
    bn_state: Dict
    opt_state: optax.OptState


def init_train_state(params, bn_state,
                     tx: optax.GradientTransformation = None) -> TrainState:
    tx = tx or scale_by_amsgrad()
    return TrainState(params=params, bn_state=bn_state,
                      opt_state=tx.init(params))


def train_step_body(
    cfg: GastNetConfig,
    variant: str,
    tx: optax.GradientTransformation,
    ts: TrainState,
    batch_2d, batch_3d, sample_weight, lr, rng,
) -> Tuple[TrainState, jnp.ndarray]:
    """The train-step computation itself (un-jitted): root-zeroed target,
    weighted-MPJPE loss, grads, optimizer update (main.py:213-243). The
    SINGLE source of the step's numerics — make_train_step jits it and
    bench.measure_train_step scan-times it, so the benched program is the
    trained program by construction.
    """
    target = batch_3d.at[:, :, 0].set(0.0)

    def loss_fn(params):
        pred, new_bn = gastnet_forward(params, ts.bn_state, batch_2d,
                                       cfg, variant=variant, train=True,
                                       rng=rng)
        # Per-sample weighted MPJPE: ragged final batches are padded to
        # a fixed shape with zero-weight filler samples, so the loss and
        # its direct gradient equal the reference's partial-batch mean
        # while shapes stay jit-stable. (Filler rows do still enter
        # train-mode BN batch statistics — a small, documented
        # divergence on the final batch of each epoch, alongside the
        # global-batch-BN one; see PARITY.md.)
        err = jnp.mean(jnp.linalg.norm(pred - target, axis=-1),
                       axis=(1, 2))
        loss = jnp.sum(err * sample_weight) / jnp.sum(sample_weight)
        return loss, new_bn

    (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        ts.params)
    updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, ts.params, updates)
    return TrainState(new_params, new_bn, new_opt), loss


def make_train_step(
    cfg: GastNetConfig,
    variant: str = "strided",
    tx: optax.GradientTransformation = None,
) -> Callable:
    """Build the jitted train step for a model config.

    The step signature is ``step(ts, batch_2d, batch_3d, sample_weight,
    lr, rng) -> (new_ts, loss)`` with ``batch_2d`` (B, T_in, J, 2),
    ``batch_3d`` (B, T_out, J, 3) camera-space targets (root joint zeroed
    inside, main.py:225), ``sample_weight`` (B,) zero for padded filler
    rows, and ``lr`` a traced scalar so per-epoch decay never recompiles.
    Compiled once per (config, shapes); under a batch-sharded input the
    gradient reduction rides ICI.
    """
    tx = tx or scale_by_amsgrad()

    @functools.partial(jax.jit, donate_argnames=("ts",))
    def step(ts: TrainState, batch_2d, batch_3d, sample_weight, lr, rng
             ) -> Tuple[TrainState, jnp.ndarray]:
        return train_step_body(cfg, variant, tx, ts, batch_2d, batch_3d,
                               sample_weight, lr, rng)

    return step


@functools.partial(jax.jit, static_argnames=("cfg", "variant"))
def eval_step(
    params: Dict,
    bn_state: Dict,
    batch_2d: jnp.ndarray,
    batch_3d: jnp.ndarray,
    cfg: GastNetConfig,
    variant: str = "dilated",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-mode forward + (sum over frames of per-frame MPJPE, frame count).

    Frame-weighted accumulation matches main.py:326-335.
    """
    target = batch_3d.at[:, :, 0].set(0.0)
    pred, _ = gastnet_forward(params, bn_state, batch_2d, cfg,
                              variant=variant, train=False)
    n_frames = pred.shape[0] * pred.shape[1]
    return mpjpe(pred, target) * n_frames, jnp.asarray(n_frames)
