"""Fused multi-head global graph attention — Pallas TPU kernel.

Replaces the inference path of :func:`gastx.ops.graph.multi_global_graph`
(reference model/global_attention.py:7-130). The XLA lowering of that module
spends its time in MXU-hostile tiny batched matmuls ((17x17)@(17x32) per
frame per head) and HBM round-trips between six intermediate tensors. This
kernel runs the whole block per row-tile in VMEM, reading x once and writing
the block output once:

    x (TM, J, C) -> theta/phi/g projections (MXU, heads stacked)
      -> per-head 3-D (TM, Jq, Jm) rank-1 scores -> leaky_relu ->
         softmax(+C_k) -> 17-step FMA over the keys
      -> head concat -> output projection (MXU) -> folded BN + ReLU

Weights stay VMEM-resident (4*C^2 floats: fits through C=512, the largest
level of every shipped config). Eval-mode only — BN is pre-folded to
scale/shift; training uses the XLA path.

Mosaic constraints honored (bisected on the axon remote compiler): no 4-D
small-lane tensors, no lane-splitting reshapes, no jax.lax.slice_in_dim
(basic ``[:, m:m+1]`` slicing only), per-head block-column projections
instead of (R, K, I) views.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gastx.ops.pallas.precision import kdot, kdot_general, tiers_from_pairs

# In-kernel matmuls keyed by the model's precision-override op classes.
KERNEL_OPS = ("attn_proj", "attn_score", "attn_apply", "attn_cat")


def _kernel(x_ref, theta_w_ref, phi_w_ref, g_w_ref, theta_b_ref, phi_b_ref,
            g_b_ref, proj_t_ref, proj_p_ref, ck_ref, cat_w_ref,
            scale_ref, shift_ref, out_ref, *, num_heads: int, inter: int,
            g_ch: int, j: int, tiers, interpret: bool):
    tm = x_ref.shape[0]
    c = x_ref.shape[2]
    xr = x_ref[:].reshape(tm * j, c)

    def dot(a, b, op):  # per-op-class explicit Mosaic precision
        return kdot(a, b, tiers[op], interpret=interpret)

    theta = dot(xr, theta_w_ref[:], "attn_proj") + theta_b_ref[:]
    phi = dot(xr, phi_w_ref[:], "attn_proj") + phi_b_ref[:]
    gx = (dot(xr, g_w_ref[:], "attn_proj")
          + g_b_ref[:]).reshape(tm, j, num_heads * g_ch)

    head_outs = []
    for k in range(num_heads):
        # Rank-1 concat_project scores for head k (columns k*I..(k+1)*I).
        tk = theta[:, k * inter:(k + 1) * inter]
        pk = phi[:, k * inter:(k + 1) * inter]
        a = dot(tk, proj_t_ref[:, k:k + 1], "attn_score").reshape(tm, j, 1)
        b = dot(pk, proj_p_ref[:, k:k + 1], "attn_score").reshape(tm, j, 1)
        f = a + jnp.swapaxes(b, 1, 2)                  # (TM, Jq, Jm)
        f = jnp.where(f > 0, f, 0.2 * f)               # LeakyReLU(0.2)
        f = f - jnp.max(f, axis=2, keepdims=True)
        ef = jnp.exp(f)
        attn = ef / jnp.sum(ef, axis=2, keepdims=True)
        attn = attn + ck_ref[k * j:(k + 1) * j, :]     # (Jq, Jm) bias

        gk = gx[:, :, k * g_ch:(k + 1) * g_ch]         # (TM, Jm, G)
        # attention application as ONE TM-batched (J,J)@(J,G) dot_general —
        # Mosaic lowers this in-VMEM (an unrolled per-key FMA loop compiles
        # but blows up remote-compiler time at 4 heads x 17 keys)
        head_outs.append(kdot_general(
            attn, gk, (((2,), (1,)), ((0,), (0,))),
            tiers["attn_apply"], interpret=interpret))  # (TM, Jq, G)

    y = jnp.concatenate(head_outs, axis=2)             # (TM, Jq, K*G)
    y = dot(y.reshape(tm * j, num_heads * g_ch), cat_w_ref[:], "attn_cat")
    y = y * scale_ref[:] + shift_ref[:]
    out_ref[:] = jnp.maximum(y, 0.0).reshape(tm, j, c)


def _pack(params: Dict, bn_scale, bn_shift):
    """Stacked (K, C, I) weights -> kernel layouts (k-major head columns)."""
    k, c, i = params["theta_w"].shape
    g_ch = params["g_w"].shape[2]

    def cols(w, width):  # (K, C, width) -> (C, K*width), k-major
        return jnp.transpose(w, (1, 0, 2)).reshape(c, k * width)

    return {
        "theta_w": cols(params["theta_w"], i),
        "phi_w": cols(params["phi_w"], i),
        "g_w": cols(params["g_w"], g_ch),
        "theta_b": params["theta_b"].reshape(1, k * i),
        "phi_b": params["phi_b"].reshape(1, k * i),
        "g_b": params["g_b"].reshape(1, k * g_ch),
        "proj_t": jnp.transpose(params["proj_theta"]),   # (I, K)
        "proj_p": jnp.transpose(params["proj_phi"]),
        # (K*J, J): head-k block ck[k*J:(k+1)*J, :]
        "ck": params["C_k"].reshape(k * params["C_k"].shape[1],
                                    params["C_k"].shape[2]),
        "cat_w": params["cat_w"],                        # (K*G, C), k-major
        "scale": bn_scale.reshape(1, -1),
        "shift": bn_shift.reshape(1, -1),
    }


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows",
                                             "precs"))
def fused_global_attention(x: jnp.ndarray, params: Dict, bn_scale, bn_shift,
                           *, interpret: bool = False,
                           tile_rows: int = 0,
                           precs: tuple = ()) -> jnp.ndarray:
    """x: (B, T, J, C) -> (B, T, J, C); eval-mode multi_global_graph.

    ``bn_scale``/``bn_shift``: the folded cat_bn affine
    (gamma/sqrt(var+eps), beta - mean*gamma/sqrt(var+eps)).
    ``precs``: static ((op_class, tier), ...) per-matmul precision pairs
    over KERNEL_OPS (Mosaic rejects ambient HIGH dots — see
    gastx/ops/pallas/precision.py); unlisted ops inherit the ambient
    default_matmul_precision.
    """
    b_, t_, j_, c_ = x.shape
    k, _, inter = params["theta_w"].shape
    g_ch = params["g_w"].shape[2]
    packed = _pack(params, bn_scale, bn_shift)

    tiers = tiers_from_pairs(precs, KERNEL_OPS)

    m_total = b_ * t_
    tm = tile_rows or max(8, min(128, 2**15 // c_))  # VMEM-bounded row tile
    pad = (-m_total) % tm
    xf = x.reshape(m_total, j_, c_)
    if pad:
        xf = jnp.concatenate(
            [xf, jnp.zeros((pad, j_, c_), x.dtype)], axis=0)
    grid = (xf.shape[0] // tm,)

    def full(*_):
        return (0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=k, inter=inter, g_ch=g_ch,
                          j=j_, tiers=tiers, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct(xf.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((c_, k * g_ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * inter), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * g_ch), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, k), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * j_, j_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * g_ch, c_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, packed["theta_w"], packed["phi_w"], packed["g_w"],
      packed["theta_b"], packed["phi_b"], packed["g_b"], packed["proj_t"],
      packed["proj_p"], packed["ck"], packed["cat_w"], packed["scale"],
      packed["shift"])

    if pad:
        out = out[:m_total]
    return out.reshape(b_, t_, j_, c_)
