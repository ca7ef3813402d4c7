"""Single-head attention core — the smallest useful Pallas kernel.

This host's remote Mosaic service kills compiles whose cost scales past a
few dots (CLAUDE.md): the full attention kernel (~15 dots) is uncompilable
there, but a 3-dot kernel is. This kernel therefore computes ONE head's
score -> leaky_relu -> softmax -> (+C_k) -> apply chain per call:

    theta_k (TM, J, I), phi_k (TM, J, I), g_k (TM, J, G)
      -> rank-1 scores (2 small dots) -> softmax + ck -> batched apply
      -> (TM, J, G)

and is invoked once per head with head-sliced inputs — SAME shapes, so it
compiles ONCE. The theta/phi/g projections and the output concat/matmul
stay in XLA (they are well-shaped MXU matmuls XLA handles fine); what the
kernel removes is the HBM round-trip of the (M, Jq, Jm) score/softmax
tensors — the most padding-hostile intermediates of the whole model
(17x17 real vs 24x128 padded tiles, CLAUDE.md perf notes).

Score/apply dots run at Precision.DEFAULT, matching the production
TPU_MIXED_PRECISION_OVERRIDES tiers for attn_score/attn_apply.
Reference semantics: model/global_attention.py:60-111.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gastx.ops.pallas.precision import kdot, kdot_general


def _kernel(theta_ref, phi_ref, g_ref, proj_t_ref, proj_p_ref, ck_ref,
            out_ref, *, j: int, score_tier: str, apply_tier: str,
            interpret: bool):
    tm = theta_ref.shape[0]
    inter = theta_ref.shape[2]

    tk = theta_ref[:].reshape(tm * j, inter)
    pk = phi_ref[:].reshape(tm * j, inter)
    sa = kdot(tk, proj_t_ref[:], score_tier,
              interpret=interpret).reshape(tm, j, 1)
    sb = kdot(pk, proj_p_ref[:], score_tier,
              interpret=interpret).reshape(tm, j, 1)
    f = sa + jnp.swapaxes(sb, 1, 2)                  # (TM, Jq, Jm)
    f = jnp.where(f > 0, f, 0.2 * f)                 # LeakyReLU(0.2)
    f = f - jnp.max(f, axis=2, keepdims=True)
    ef = jnp.exp(f)
    attn = ef / jnp.sum(ef, axis=2, keepdims=True)
    attn = attn + ck_ref[:]                          # (Jq, Jm) bias

    out_ref[:] = kdot_general(
        attn, g_ref[:], (((2,), (1,)), ((0,), (0,))), apply_tier,
        interpret=interpret)                         # (TM, Jq, G)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows",
                                             "score_tier", "apply_tier"))
def head_attention(theta_k: jnp.ndarray, phi_k: jnp.ndarray,
                   g_k: jnp.ndarray, proj_t: jnp.ndarray,
                   proj_p: jnp.ndarray, ck: jnp.ndarray, *,
                   interpret: bool = False, tile_rows: int = 32,
                   score_tier: str = "default",
                   apply_tier: str = "default") -> jnp.ndarray:
    """One attention head: (M, J, I) theta/phi + (M, J, G) g -> (M, J, G).

    ``proj_t``/``proj_p``: (I, 1) rank-1 score projections; ``ck``: (J, J)
    learned bias added after the softmax. ``tile_rows`` defaults to 32:
    the (TM, Jq, Jm) softmax temporaries pad Jm to 128 lanes, and at
    TM=128 their scoped-VMEM stack measures 21.45M > the 16M limit
    (compile-time OOM on v5e); 32 keeps the stack ~5M.

    ``score_tier``/``apply_tier``: explicit Mosaic precision tiers for the
    score and application dots — callers must pass the model's resolved
    attn_score/attn_apply tiers so non-mixed configs (e.g. all-"high")
    keep their precision contract inside the kernel.
    """
    m, j, inter = theta_k.shape
    g_ch = g_k.shape[2]

    tm = min(tile_rows, max(8, m))
    pad = (-m) % tm

    def padm(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return x

    theta_k, phi_k, g_k = padm(theta_k), padm(phi_k), padm(g_k)
    grid = (theta_k.shape[0] // tm,)

    def full(*_):
        return (0, 0)

    vm = pltpu.VMEM
    row = lambda i: (i, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, j=j, score_tier=score_tier,
                          apply_tier=apply_tier, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((theta_k.shape[0], j, g_ch),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, j, inter), row, memory_space=vm),
            pl.BlockSpec((tm, j, inter), row, memory_space=vm),
            pl.BlockSpec((tm, j, g_ch), row, memory_space=vm),
            pl.BlockSpec((inter, 1), full, memory_space=vm),
            pl.BlockSpec((inter, 1), full, memory_space=vm),
            pl.BlockSpec((j, j), full, memory_space=vm),
        ],
        out_specs=pl.BlockSpec((tm, j, g_ch), row, memory_space=vm),
        interpret=interpret,
    )(theta_k, phi_k, g_k, proj_t, proj_p, ck)

    if pad:
        out = out[:m]
    return out
