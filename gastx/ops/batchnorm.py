"""Functional batch normalization over the channel (last) axis.

Parity target: torch ``nn.BatchNorm2d(momentum=0.1, eps=1e-5)`` applied to
``(B, C, T, N)`` activations throughout the reference model (e.g.
model/gast_net.py:58-59,147-149). Here activations are channels-last
``(B, T, N, C)`` so normalization reduces over all leading axes.

Train mode uses biased batch variance for normalization and updates running
variance with the unbiased estimate, matching torch semantics. Under pjit with
a batch-sharded input the reductions become global (XLA inserts the psum), so
multi-chip training uses true global-batch statistics — a documented
divergence from the reference's per-GPU DataParallel BN.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def init_batch_norm(num_features: int, dtype=jnp.float32):
    """Returns (params, state) for a BN layer: scale/bias, running mean/var."""
    params = {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }
    return params, state


def batch_norm(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    state: Dict[str, jnp.ndarray],
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Normalize ``x`` (..., C) per channel. Returns (y, new_state)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = int(np.prod(x.shape[:-1]))
        correction = n / max(n - 1, 1)
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * (var * correction),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = 1.0 / jnp.sqrt(var + eps)
    y = (x - mean) * (inv * params["scale"]) + params["bias"]
    return y, new_state
