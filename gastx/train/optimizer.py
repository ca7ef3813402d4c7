"""Adam(amsgrad) optimizer matching torch.optim.Adam(amsgrad=True) semantics.

The reference trains with ``Adam(amsgrad=True), lr=1e-3`` and a x0.95
per-epoch exponential decay (trainval.py:78,161-164; common/arguments.py:44-49).
optax has no amsgrad transform, so this implements torch's exact update rule
(including its bias-correction placement): ::

    m_t = b1 m + (1-b1) g
    v_t = b2 v + (1-b2) g^2
    vmax = max(vmax, v_t)
    p  -= lr/(1-b1^t) * m_t / (sqrt(vmax)/sqrt(1-b2^t) + eps)

The transform is lr-free: it emits the *unscaled* step so the training loop
can apply the per-epoch-decayed learning rate as a traced scalar (no
recompiles when lr changes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AmsgradState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    vmax: optax.Updates


def scale_by_amsgrad(b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AmsgradState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree_util.tree_map(jnp.zeros_like, params),
            vmax=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state.m, grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1 - b2) * (g * g), state.v, grads)
        vmax = jax.tree_util.tree_map(jnp.maximum, state.vmax, v)

        bc1 = 1 - b1**t
        bc2 = 1 - b2**t
        updates = jax.tree_util.tree_map(
            lambda mm, vm: (mm / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            m, vmax)
        return updates, AmsgradState(count=count, m=m, v=v, vmax=vmax)

    return optax.GradientTransformation(init_fn, update_fn)


def exponential_epoch_decay(initial_lr: float, decay: float,
                            epoch: int) -> float:
    """lr after ``epoch`` full epochs of x``decay`` (trainval.py:161-164)."""
    return initial_lr * (decay**epoch)
