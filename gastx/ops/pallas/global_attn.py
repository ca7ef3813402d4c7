"""Fused multi-head global graph attention — Pallas TPU kernel.

Replaces the inference path of :func:`gastx.ops.graph.multi_global_graph`
(reference model/global_attention.py:7-130). The XLA lowering of that module
spends its time in MXU-hostile tiny batched matmuls ((17x17)@(17x32) per
frame per head) and HBM round-trips between six intermediate tensors. This
kernel runs the whole block per row-tile in VMEM:

    x (TM, J, C) -> theta/phi/g projections (MXU, heads stacked)
      -> per-head rank-1 scores via block-diagonal projection matmuls
      -> leaky_relu -> softmax(+C_k) over the J=17 keys
      -> attention-weighted sum over keys (J unrolled; the per-head
         broadcast is a one-hot expansion matmul — Mosaic cannot split the
         lane dimension, so no (R, K*G) -> (R, K, G) reshapes appear)
      -> head merge -> output projection (MXU) -> folded BN + ReLU

reading x once and writing the block output once. Weights stay VMEM-resident
(4*C^2 floats: fits through C=512, the largest level of every shipped
config). Eval-mode only — BN is pre-folded to scale/shift; training uses the
XLA path.

Head-channel layout inside the kernel is g-major (column g*K + k) so the
attention weight for head k broadcasts to its G channels with one (K, G*K)
one-hot matmul; the packed g/cat weights are permuted to match, so results
are bit-identical to the XLA path's k-major concat.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, theta_w_ref, phi_w_ref, g_w_ref, theta_b_ref, phi_b_ref,
            g_b_ref, proj_t_ref, proj_p_ref, ck_ref, expand_ref, cat_w_ref,
            scale_ref, shift_ref, out_ref, *, num_heads: int, j: int):
    tm = x_ref.shape[0]
    c = x_ref.shape[2]
    k = num_heads
    xr = x_ref[:].reshape(tm * j, c)

    theta = jnp.dot(xr, theta_w_ref[:],
                    preferred_element_type=jnp.float32) + theta_b_ref[:]
    phi = jnp.dot(xr, phi_w_ref[:],
                  preferred_element_type=jnp.float32) + phi_b_ref[:]
    gx = (jnp.dot(xr, g_w_ref[:],
                  preferred_element_type=jnp.float32)
          + g_b_ref[:]).reshape(tm, j, -1)

    # Rank-1 concat_project scores per head: block-diagonal projections map
    # (R, K*I) -> (R, K) on the MXU (no lane-splitting reshapes).
    a = jnp.dot(theta, proj_t_ref[:],
                preferred_element_type=jnp.float32).reshape(tm, j, k)
    b = jnp.dot(phi, proj_p_ref[:],
                preferred_element_type=jnp.float32).reshape(tm, j, k)

    f = a[:, :, None, :] + b[:, None, :, :]          # (TM, Jq, Jm, K)
    f = jnp.where(f > 0, f, 0.2 * f)                  # LeakyReLU(0.2)
    f = f - jnp.max(f, axis=2, keepdims=True)
    ef = jnp.exp(f)
    attn = ef / jnp.sum(ef, axis=2, keepdims=True)
    attn = attn + ck_ref[:]                           # (Jq, Jm, K) bias

    # y[t, q, g*K+k] = sum_m attn[t, q, m, k] * gx[t, m, g*K+k]; J is tiny
    # and static -> unrolled FMA; expand (R, K) -> (R, G*K) via one-hot MXU
    # matmul (tiling: lane dims never split).
    acc = None
    for m in range(j):
        attn_m = jax.lax.slice_in_dim(attn, m, m + 1, axis=2)  # (TM,Jq,1,K)
        rep = jnp.dot(attn_m.reshape(tm * j, k), expand_ref[:],
                      preferred_element_type=jnp.float32)       # (R, G*K)
        gx_m = jax.lax.slice_in_dim(gx, m, m + 1, axis=1)       # (TM,1,GK)
        term = rep.reshape(tm, j, -1) * gx_m
        acc = term if acc is None else acc + term

    y = jnp.dot(acc.reshape(tm * j, -1), cat_w_ref[:],
                preferred_element_type=jnp.float32)
    y = y * scale_ref[:] + shift_ref[:]
    out_ref[:] = jnp.maximum(y, 0.0).reshape(tm, j, c)


def _pack(params: Dict, bn_scale, bn_shift):
    """Stacked (K, C, I) weights -> kernel layouts (g-major head channels)."""
    k, c, i = params["theta_w"].shape
    g_ch = params["g_w"].shape[2]

    def cols_kmajor(w, width):  # (K, C, width) -> (C, K*width), k-major
        return jnp.transpose(w, (1, 0, 2)).reshape(c, k * width)

    # g-major head channels: column g*K + k
    g_w = jnp.transpose(params["g_w"], (1, 2, 0)).reshape(c, g_ch * k)
    g_b = jnp.transpose(params["g_b"], (1, 0)).reshape(1, g_ch * k)
    # cat rows k-major (k*G+g) -> g-major (g*K+k)
    cat_w = params["cat_w"].reshape(k, g_ch, c)
    cat_w = jnp.transpose(cat_w, (1, 0, 2)).reshape(g_ch * k, c)

    # block-diagonal score projections: (K*I, K), k-major rows (traced
    # params -> scatter with static indices)
    rows = np.arange(k * i)
    cols = np.repeat(np.arange(k), i)
    proj_t = jnp.zeros((k * i, k), jnp.float32).at[rows, cols].set(
        params["proj_theta"].reshape(-1))
    proj_p = jnp.zeros((k * i, k), jnp.float32).at[rows, cols].set(
        params["proj_phi"].reshape(-1))

    # one-hot expansion (K, G*K): E[k, g*K+k] = 1
    expand = np.zeros((k, g_ch * k), np.float32)
    for kk in range(k):
        expand[kk, np.arange(g_ch) * k + kk] = 1.0

    return {
        "theta_w": cols_kmajor(params["theta_w"], i),
        "phi_w": cols_kmajor(params["phi_w"], i),
        "g_w": g_w,
        "theta_b": params["theta_b"].reshape(1, k * i),
        "phi_b": params["phi_b"].reshape(1, k * i),
        "g_b": g_b,
        "proj_t": jnp.asarray(proj_t),
        "proj_p": jnp.asarray(proj_p),
        "ck": jnp.transpose(params["C_k"], (1, 2, 0)),  # (Jq, Jm, K)
        "expand": jnp.asarray(expand),
        "cat_w": cat_w,
        "scale": bn_scale.reshape(1, -1),
        "shift": bn_shift.reshape(1, -1),
    }


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_global_attention(x: jnp.ndarray, params: Dict, bn_scale, bn_shift,
                           *, interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, J, C) -> (B, T, J, C); eval-mode multi_global_graph.

    ``bn_scale``/``bn_shift``: the folded cat_bn affine
    (gamma/sqrt(var+eps), beta - mean*gamma/sqrt(var+eps)).
    """
    b_, t_, j_, c_ = x.shape
    k, _, inter = params["theta_w"].shape
    g_ch = params["g_w"].shape[2]
    packed = _pack(params, bn_scale, bn_shift)

    m_total = b_ * t_
    tm = max(8, min(64, 2**14 // c_))  # row tile: VMEM- and compile-bounded
    pad = (-m_total) % tm
    xf = x.reshape(m_total, j_, c_)
    if pad:
        xf = jnp.concatenate(
            [xf, jnp.zeros((pad, j_, c_), x.dtype)], axis=0)
    grid = (xf.shape[0] // tm,)

    def full(*_):
        return (0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=k, j=j_),
        out_shape=jax.ShapeDtypeStruct(xf.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_, g_ch * k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_ch * k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * inter, k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * inter, k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((j_, j_, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, g_ch * k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((g_ch * k, c_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, packed["theta_w"], packed["phi_w"], packed["g_w"],
      packed["theta_b"], packed["phi_b"], packed["g_b"], packed["proj_t"],
      packed["proj_p"], packed["ck"], packed["expand"], packed["cat_w"],
      packed["scale"], packed["shift"])

    if pad:
        out = out[:m_total]
    return out.reshape(b_, t_, j_, c_)
