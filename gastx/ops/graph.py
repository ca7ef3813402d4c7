"""Graph-attention primitives over the joint axis, channels-last.

These are the TPU-native rewrites of the reference's spatial modules:

  * :func:`sem_ch_graph_conv` — channel-wise semantic graph convolution
    (reference ``model/local_attention.py:10-53``). The reference materializes
    a per-channel adjacency, multiplies it by identity / one-minus-identity
    masks, and runs two (C,J,J)x(B,T,C,J,1) matmuls. We exploit that
    ``adj * E`` is exactly the softmax diagonal — an *elementwise* term — so
    only the off-diagonal aggregation needs a (tiny, C-batched) matmul.

  * :func:`local_graph` — the sym+con two-branch local module
    (``model/local_attention.py:59-151``).

  * :func:`multi_global_graph` — multi-head non-local attention over joints
    (``model/global_attention.py:7-130``). The reference scores pairs by
    broadcasting theta/phi maps to (B*T, C/k, N, N) and applying a 1x1 conv
    ``concat_project``; since that conv is linear over the concatenated
    channels, the score decomposes as ``f[n, m] = <w_theta, theta_n> +
    <w_phi, phi_m>`` — two rank-1 terms we compute without ever building the
    (B*T, C/k, N, N) tensor. All heads are evaluated in one batched einsum
    from stacked weights.

All functions take/return (B, T, J, C) activations and thread BN state
functionally. ``train`` must be a static (Python) bool under jit.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gastx.ops.batchnorm import batch_norm

# Matches the reference's masked-softmax fill value exactly
# (model/local_attention.py:40); intentionally not -inf for fp32 parity.
_MASK_FILL = -9e15


def sem_ch_graph_conv(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    mask_idx: np.ndarray,
    num_joints: int,
) -> jnp.ndarray:
    """Channel-wise semantic graph conv.

    ``x``: (B, T, J, Cin). ``params``: W0/W1 (Cin, Cout) self/neighbor weight
    matrices, e (Cout, nnz) learnable edge logits, optional bias (Cout,).
    ``mask_idx``: static flat row-major indices of adjacency nonzeros (the
    ordering matches ``torch.nonzero`` so imported ``e`` tensors line up).
    """
    w0, w1, e = params["W0"], params["W1"], params["e"]
    c_out = w0.shape[1]
    j = num_joints

    h0 = jnp.matmul(x, w0)
    h1 = jnp.matmul(x, w1)

    logits = jnp.full((c_out, j * j), _MASK_FILL, dtype=x.dtype)
    logits = logits.at[:, mask_idx].set(e.astype(x.dtype))
    adj = jax.nn.softmax(logits.reshape(c_out, j, j), axis=2)

    diag = jnp.diagonal(adj, axis1=1, axis2=2)          # (C, J)
    off = adj * (1.0 - jnp.eye(j, dtype=x.dtype))       # (C, J, J)

    out = h0 * diag.T + jnp.einsum("cjk,btkc->btjc", off, h1)
    if "bias" in params:
        out = out + params["bias"]
    return out


def _dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def local_graph(
    x: jnp.ndarray,
    params: Dict,
    state: Dict,
    statics,
    *,
    train: bool,
    dropout_rate: float,
    rng=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Two-branch (mirror-symmetry + kinematic-connection) local module."""
    j = statics.num_joints
    a = sem_ch_graph_conv(x, params["sym"], statics.sym_idx, j)
    b = sem_ch_graph_conv(x, params["con"], statics.con_idx, j)

    a, s_bn1 = batch_norm(a, params["bn_sym"], state["bn_sym"], train=train)
    b, s_bn2 = batch_norm(b, params["bn_con"], state["bn_con"], train=train)
    a = jax.nn.relu(a)
    b = jax.nn.relu(b)

    y = jnp.matmul(jnp.concatenate([a, b], axis=-1), params["cat_w"])
    y, s_cat = batch_norm(y, params["cat_bn"], state["cat_bn"], train=train)
    y = jax.nn.relu(y)
    if train and dropout_rate > 0.0:
        y = _dropout(y, dropout_rate, rng)

    new_state = {"bn_sym": s_bn1, "bn_con": s_bn2, "cat_bn": s_cat}
    return y, new_state


def multi_global_graph(
    x: jnp.ndarray,
    params: Dict,
    state: Dict,
    *,
    train: bool,
    dropout_rate: float,
    rng=None,
) -> Tuple[jnp.ndarray, Dict]:
    """Multi-head non-local attention over joints, all heads batched.

    Stacked parameters: theta_w/phi_w (K, C, I), g_w (K, C, G), biases
    (K, I)/(K, G), proj_theta/proj_phi (K, I) — the split halves of the
    reference's ``concat_project`` 1x1-conv weight — and C_k (K, J, J)
    learnable attention biases.

    Layout strategy (measured ~1.6x over the naive head-batched einsums on
    v5e): activations stay flat (B*T*J, C) channels-last through the three
    projections and the output matmul — no (b, k, j, i) intermediates to
    transpose — and the per-head rank-1 scores come from block-diagonal
    projection matrices so they are plain matmuls too. Only the tiny
    (M, Jq, Jm, K) attention tensor is 4-D.
    """
    b_, t_, j_, c_ = x.shape
    k, _, i = params["theta_w"].shape
    g_ch = params["g_w"].shape[2]
    m = b_ * t_
    xf = x.reshape(m * j_, c_)

    def cols(w, width):  # (K, C, width) -> (C, K*width), head-major columns
        return jnp.transpose(w, (1, 0, 2)).reshape(c_, k * width)

    theta = jnp.matmul(xf, cols(params["theta_w"], i)) + \
        params["theta_b"].reshape(k * i)
    phi = jnp.matmul(xf, cols(params["phi_w"], i)) + \
        params["phi_b"].reshape(k * i)
    gx = jnp.matmul(xf, cols(params["g_w"], g_ch)) + \
        params["g_b"].reshape(k * g_ch)

    # Pairwise score decomposed from concat_project: f[q, m] = a[q] + b[m],
    # per head via block-diagonal (K*I, K) projections.
    rows = np.arange(k * i)
    blocks = np.repeat(np.arange(k), i)
    p_t = jnp.zeros((k * i, k), x.dtype).at[rows, blocks].set(
        params["proj_theta"].reshape(-1))
    p_p = jnp.zeros((k * i, k), x.dtype).at[rows, blocks].set(
        params["proj_phi"].reshape(-1))
    a = jnp.matmul(theta, p_t).reshape(m, j_, 1, k)
    b = jnp.matmul(phi, p_p).reshape(m, 1, j_, k)

    f = jax.nn.leaky_relu(a + b, negative_slope=0.2)
    attn = jax.nn.softmax(f, axis=2)
    attn = attn + jnp.transpose(params["C_k"], (1, 2, 0))  # (Jq, Jm, K)

    # Head-major channel blocks match the reference's torch.cat over head
    # outputs (global_attention.py:111).
    gx4 = gx.reshape(m, j_, k, g_ch)
    y = jnp.einsum("mqnk,mnkg->mqkg", attn, gx4)
    y = y.reshape(b_, t_, j_, k * g_ch)

    y = jnp.matmul(y, params["cat_w"])
    y, s_cat = batch_norm(y, params["cat_bn"], state["cat_bn"], train=train)
    y = jax.nn.relu(y)
    if train and dropout_rate > 0.0:
        y = _dropout(y, dropout_rate, rng)

    return y, {"cat_bn": s_cat}


def graph_attention_block(
    x: jnp.ndarray,
    params: Dict,
    state: Dict,
    statics,
    *,
    train: bool,
    dropout_rate: float,
    rng=None,
) -> Tuple[jnp.ndarray, Dict]:
    """residual ++ local ++ global -> 1x1 conv (3C->2C) -> BN -> ReLU.

    Reference: model/gast_net.py:8-33. This is where channels double.
    """
    rng_l = rng_g = None
    if rng is not None:
        rng_l, rng_g = jax.random.split(rng)

    local, s_local = local_graph(
        x, params["local"], state["local"], statics,
        train=train, dropout_rate=dropout_rate, rng=rng_l)
    globl, s_glob = multi_global_graph(
        x, params["global"], state["global"],
        train=train, dropout_rate=dropout_rate, rng=rng_g)

    y = jnp.concatenate([x, local, globl], axis=-1)
    y = jnp.matmul(y, params["cat_w"])
    y, s_cat = batch_norm(y, params["cat_bn"], state["cat_bn"], train=train)
    y = jax.nn.relu(y)

    return y, {"local": s_local, "global": s_glob, "cat_bn": s_cat}
