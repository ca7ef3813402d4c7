"""Ablation / alternative spatial modules kept for reference parity.

These mirror modules the reference ships but does not use in its default
configuration (SURVEY.md §2.1):
  * :func:`sem_graph_conv` — NON-channel-wise semantic graph conv with a
    single shared edge-weight vector (reference ``model/sem_graph_conv.py:
    10-55``; the production model uses the channel-wise variant).
  * :func:`local_graph_simple` — the LocalGraph built on it
    (``model/sem_graph_conv.py:58-153``).
  * :func:`single_global_graph` — single-head non-local alternative to
    MultiGlobalGraph (``model/global_attention.py:133-173``, commented out at
    model/gast_net.py:17).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gastx.ops.batchnorm import batch_norm
from gastx.ops.graph import _MASK_FILL, _dropout


def sem_graph_conv(x: jnp.ndarray, params: Dict, mask_idx: np.ndarray,
                   num_joints: int) -> jnp.ndarray:
    """Shared-edge-weight semantic graph conv.

    ``params``: W0/W1 (Cin, Cout), e (nnz,) shared across channels, optional
    bias (Cout,) (reference uses bias=True by default).
    """
    w0, w1, e = params["W0"], params["W1"], params["e"]
    j = num_joints

    h0 = jnp.matmul(x, w0)
    h1 = jnp.matmul(x, w1)

    logits = jnp.full((j * j,), _MASK_FILL, dtype=x.dtype)
    logits = logits.at[mask_idx].set(e.reshape(-1).astype(x.dtype))
    adj = jax.nn.softmax(logits.reshape(j, j), axis=1)

    diag = jnp.diagonal(adj)
    off = adj * (1.0 - jnp.eye(j, dtype=x.dtype))
    out = h0 * diag[:, None] + jnp.einsum("jk,btkc->btjc", off, h1)
    if "bias" in params:
        out = out + params["bias"]
    return out


def local_graph_simple(x: jnp.ndarray, params: Dict, state: Dict, statics, *,
                       train: bool, dropout_rate: float, rng=None
                       ) -> Tuple[jnp.ndarray, Dict]:
    """Two-branch local module on the non-channel-wise graph conv
    (model/sem_graph_conv.py:126-153)."""
    j = statics.num_joints
    a = sem_graph_conv(x, params["sym"], statics.sym_idx, j)
    b = sem_graph_conv(x, params["con"], statics.con_idx, j)

    a, s_bn1 = batch_norm(a, params["bn_sym"], state["bn_sym"], train=train)
    b, s_bn2 = batch_norm(b, params["bn_con"], state["bn_con"], train=train)
    a = jax.nn.relu(a)
    b = jax.nn.relu(b)

    y = jnp.matmul(jnp.concatenate([a, b], axis=-1), params["cat_w"])
    y, s_cat = batch_norm(y, params["cat_bn"], state["cat_bn"], train=train)
    y = jax.nn.relu(y)
    if train and dropout_rate > 0.0:
        y = _dropout(y, dropout_rate, rng)
    return y, {"bn_sym": s_bn1, "bn_con": s_bn2, "cat_bn": s_cat}


def single_global_graph(x: jnp.ndarray, params: Dict, state: Dict, *,
                        train: bool, dropout_rate: float, rng=None
                        ) -> Tuple[jnp.ndarray, Dict]:
    """Single-head non-local attention (BN directly on the head output,
    no cat conv — global_attention.py:146-173).

    Head params: theta_w/phi_w (C, I), g_w (C, G), biases, proj_theta/
    proj_phi (I,), C_k (J, J).
    """
    b_, t_, j_, c_ = x.shape
    xf = x.reshape(b_ * t_, j_, c_)

    theta = jnp.matmul(xf, params["theta_w"]) + params["theta_b"]
    phi = jnp.matmul(xf, params["phi_w"]) + params["phi_b"]
    g = jnp.matmul(xf, params["g_w"]) + params["g_b"]

    score = (jnp.matmul(theta, params["proj_theta"])[:, :, None]
             + jnp.matmul(phi, params["proj_phi"])[:, None, :])
    attn = jax.nn.softmax(jax.nn.leaky_relu(score, 0.2), axis=-1)
    attn = attn + params["C_k"][None]

    y = jnp.matmul(attn, g).reshape(b_, t_, j_, -1)
    y, s_bn = batch_norm(y, params["bn"], state["bn"], train=train)
    y = jax.nn.relu(y)
    if train and dropout_rate > 0.0:
        y = _dropout(y, dropout_rate, rng)
    return y, {"bn": s_bn}
