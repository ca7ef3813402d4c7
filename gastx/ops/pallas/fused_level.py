"""Level-fused Pallas kernel: temporal conv chain + GraphAttentionBlock.

The r3 whole-block kernels (fused_gab.py) removed the graph block's
internal HBM traffic, but each level of the reference architecture
(model/gast_net.py:139-161) still round-trips three full-size activations
through HBM between blocks: the dilated temporal-conv output, the 1x1
mid-conv output, and the residual-summed block input. At 27f those
intermediates are ~40% of the remaining per-sequence traffic (DESIGN.md
roofline).

This kernel fuses ONE ENTIRE LEVEL per batch element:

    y (T_in, J, C) --[dilated conv fw taps -> BN -> ReLU
                      -> 1x1 -> BN -> ReLU -> + residual slice]
                   --[whole GraphAttentionBlock (fused_gab bodies)]
                   --> (T_out, J, 2C)

entirely in VMEM: the level input is read from HBM once and only the
(T_out, J, 2C) block output is written back. Grid = batch elements (one
sequence's level fits VMEM comfortably at 27f: T<=25 rows). The dilated
valid conv becomes ``fw`` static row-slice dots on the flattened
(T*J, C) activations — tap k reads rows [k*d*J : k*d*J + T_out*J] — and
the residual is a static row slice, so no gather/scatter appears.

Eval/dilated only (training and the strided variant use the XLA path);
BN is pre-folded to scale/shift. C <= MAX_FUSED_CHANNELS (the GAB weight
set must stay VMEM-resident) — at 27f that fuses level 1 (C=256), at 81f
levels 1-2, at 243f levels 1-3; the C=512 widest level keeps the split
kernels (its T_out is 1 frame at every shipped config, so its interior
traffic is negligible).

Reference: model/gast_net.py:145-161 (the slice/conv/residual loop) +
model/gast_net.py:8-33 (GraphAttentionBlock).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gastx.ops.pallas.fused_gab import (
    _GLOBAL_NREFS, _LOCAL_NREFS, MAX_FUSED_CHANNELS, _block_concat,
    _concat_ins, _ensure_f32, _fold_bn, _full, _global_ins_form,
    _local_ins_form, _make_dots, _run_global, _run_local)
from gastx.ops.pallas.precision import tiers_from_pairs

# The conv-chain dots, by the model's precision-override op classes
# (level-qualified "lvl{i}.temporal" etc. resolve at the call site);
# concatenated with fused_gab.KERNEL_OPS for the block's own dots.
LEVEL_OPS = ("temporal", "mid1x1")


def _kernel_level(x_ref, *refs,
                  fw: int, dilation: int, res_off: int, t_out: int,
                  num_heads: int, inter: int, g_ch: int, j: int,
                  local_aux, tiers, interpret: bool, form: str,
                  softmax_group: int = 1, apply_block: bool = False,
                  score_block: bool = False, has_mid: bool = True):
    """``has_mid``: interior levels run [conv->BN->ReLU->1x1->BN->ReLU
    ->+residual]; level 0 (the expand level) has no mid 1x1 and no
    residual (model/gast_net.py:163-165), signalled by has_mid=False +
    res_off=-1."""
    out_ref = refs[-1]
    nconv = 6 if has_mid else 3
    (wt_ref, bnt_scale_ref, bnt_shift_ref) = refs[:3]
    if has_mid:
        (w1_ref, bn1_scale_ref, bn1_shift_ref) = refs[3:6]
    nl = _LOCAL_NREFS[form]
    lrefs = refs[nconv:nconv + nl]
    grefs = refs[nconv + nl:nconv + nl + _GLOBAL_NREFS[form]]
    crefs = refs[nconv + nl + _GLOBAL_NREFS[form]:-1]
    c_in = x_ref.shape[-1]
    c = wt_ref.shape[-1]
    rows = t_out * j
    xr = x_ref[0].astype(jnp.float32)            # (T_in*J, C_in)
    dot, dotg = _make_dots(tiers, interpret)

    # Dilated valid temporal conv as fw static row-slice dots: output
    # frame t reads input frames t + k*dilation, so tap k is the
    # contiguous row window starting at frame k*dilation.
    z = dot(xr[0:rows, :], wt_ref[0:c_in, :], "temporal")
    for k in range(1, fw):
        start = k * dilation * j
        z = z + dot(xr[start:start + rows, :],
                    wt_ref[k * c_in:(k + 1) * c_in, :], "temporal")
    z = jnp.maximum(z * bnt_scale_ref[:] + bnt_shift_ref[:], 0.0)
    if has_mid:
        z = dot(z, w1_ref[:], "mid1x1")
        z = jnp.maximum(z * bn1_scale_ref[:] + bn1_shift_ref[:], 0.0)

    # Residual: the reference's center slice (model/gast_net.py:153),
    # shifted for causal configs; res_off=-1 disables (level 0).
    if res_off >= 0:
        y1 = xr[res_off * j:res_off * j + rows, :] + z
    else:
        y1 = z

    local = _run_local(form, y1, t_out, j, c, dot, lrefs, local_aux)
    globl = _run_global(form, y1, t_out, j, c, dot, dotg, grefs,
                        num_heads, inter, g_ch, softmax_group,
                        apply_block, score_block)
    y = _block_concat(y1, local, globl, c, dot, *crefs)
    out_ref[:] = y.reshape(1, rows, 2 * c).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("fw", "dilation", "res_off", "sym_idx",
                                    "con_idx", "interpret", "precs", "form",
                                    "softmax_group",
                                    "apply_block", "score_block"))
def fused_level(x: jnp.ndarray, conv_params: Dict, conv_state: Dict,
                gab_params: Dict, gab_state: Dict,
                sym_idx: tuple, con_idx: tuple, *,
                fw: int, dilation: int, res_off: int,
                interpret: bool = False,
                precs: tuple = (), form: str = "v1",
                softmax_group: int = 1,
                apply_block: bool = False,
                score_block: bool = False) -> jnp.ndarray:
    """One architecture level, fused: (B, T, J, C) -> (B, T', J, 2C) with
    T' = T - (fw-1)*dilation.

    ``conv_params``/``conv_state``: the level's temporal subtree
    ({"conv_t", "bn_t", "conv_1", "bn_1"}); ``gab_params``/``gab_state``:
    the GAB subtree as for :func:`fused_gab`. ``res_off``: residual slice
    start in frames (pad + causal shift). ``precs``: static
    ((op_class, tier), ...) over LEVEL_OPS + fused_gab.KERNEL_OPS.
    """
    from gastx.ops.pallas.fused_gab import KERNEL_OPS

    b_, t_in, j_, c_ = x.shape
    t_out = t_in - (fw - 1) * dilation
    if c_ > MAX_FUSED_CHANNELS:
        raise ValueError(
            f"fused_level supports C <= {MAX_FUSED_CHANNELS}, got {c_}")
    conv_params = _ensure_f32(conv_params)
    conv_state = _ensure_f32(conv_state)
    gab_params, gab_state = _ensure_f32(gab_params), _ensure_f32(gab_state)
    lp, gp = gab_params["local"], gab_params["global"]
    k, _, inter = gp["theta_w"].shape
    g_ch = gp["g_w"].shape[2]
    tiers = tiers_from_pairs(precs, LEVEL_OPS + KERNEL_OPS)

    bnt = _fold_bn(conv_params["bn_t"], conv_state["bn_t"])
    bn1 = _fold_bn(conv_params["bn_1"], conv_state["bn_1"])
    vm = pltpu.VMEM
    wt = conv_params["conv_t"]["w"].reshape(fw * c_, c_)
    conv_ins = [
        (wt, pl.BlockSpec((fw * c_, c_), _full, memory_space=vm)),
        (bnt[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bnt[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (conv_params["conv_1"]["w"],
         pl.BlockSpec((c_, c_), _full, memory_space=vm)),
        (bn1[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bn1[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]
    local_ins, local_aux = _local_ins_form(form, lp, gab_state, sym_idx,
                                           con_idx, j_, c_)
    ins = conv_ins + local_ins \
        + _global_ins_form(form, gp, gab_state, j_, c_, k, inter, g_ch,
                           score_block=score_block) \
        + _concat_ins(gab_params, gab_state, c_)

    xf = x.reshape(b_, t_in * j_, c_)
    out = pl.pallas_call(
        functools.partial(_kernel_level, fw=fw, dilation=dilation,
                          res_off=res_off, t_out=t_out, num_heads=k,
                          inter=inter, g_ch=g_ch, j=j_, local_aux=local_aux,
                          tiers=tiers, interpret=interpret, form=form,
                          softmax_group=softmax_group,
                          apply_block=apply_block,
                          score_block=score_block),
        out_shape=jax.ShapeDtypeStruct((b_, t_out * j_, 2 * c_), x.dtype),
        grid=(b_,),
        in_specs=[pl.BlockSpec((1, t_in * j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [spec for _, spec in ins],
        out_specs=pl.BlockSpec((1, t_out * j_, 2 * c_), lambda i: (i, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, *[arr for arr, _ in ins])
    return out.reshape(b_, t_out, j_, 2 * c_)


@functools.partial(jax.jit,
                   static_argnames=("fw", "sym_idx", "con_idx", "interpret",
                                    "precs", "form", "softmax_group",
                                    "apply_block", "score_block"))
def fused_level0(x: jnp.ndarray, params: Dict, state: Dict,
                 sym_idx: tuple, con_idx: tuple, *,
                 fw: int, interpret: bool = False,
                 precs: tuple = (), form: str = "v1",
                 softmax_group: int = 1,
                 apply_block: bool = False,
                 score_block: bool = False) -> jnp.ndarray:
    """Level 0 (the expand level), fused: RAW (B, T, J, C_in) 2D keypoints
    -> (B, T-fw+1, J, 2C) first-block output, one kernel per sequence.

    The whole prefix [init_bn -> expand_conv -> expand_bn -> ReLU -> GAB0]
    (model/gast_net.py:162-165) folds into [conv' -> affine -> ReLU -> GAB0]:
    init_bn is a per-channel affine x*a + b, so conv(x*a + b) = conv_w'(x)
    + bias with w'[k,c,o] = w[k,c,o]*a[c], and both the bias and expand_bn
    fold into the kernel's post-conv scale/shift. The kernel therefore
    reads the 2-lane raw input — ~64x fewer HBM bytes than the expand-conv
    output the per-GAB kernel reads — and the expand level's XLA dispatches
    disappear.

    ``params``/``state``: the full model trees ({"init_bn", "expand_conv",
    "expand_bn", "gabs", ...}); only the level-0 subtrees are consumed.
    Eval/dilated only (stride 1, dilation 1).
    """
    from gastx.ops.pallas.fused_gab import KERNEL_OPS

    b_, t_in, j_, c_in = x.shape
    t_out = t_in - (fw - 1)
    params, state = _ensure_f32(params), _ensure_f32(state)
    gab_params, gab_state = params["gabs"][0], state["gabs"][0]
    lp, gp = gab_params["local"], gab_params["global"]
    k, _, inter = gp["theta_w"].shape
    g_ch = gp["g_w"].shape[2]
    c_ = gp["theta_w"].shape[1]
    if c_ > MAX_FUSED_CHANNELS:
        raise ValueError(
            f"fused_level0 supports C <= {MAX_FUSED_CHANNELS}, got {c_}")
    tiers = tiers_from_pairs(precs, LEVEL_OPS + KERNEL_OPS)

    # Fold init_bn (affine a, b) into the expand conv: w' = w * a[c] and a
    # constant output bias sum_{k,c} w[k,c,o] * b[c], absorbed into the
    # expand_bn fold's shift.
    a_i, b_i = _fold_bn(params["init_bn"], state["init_bn"])
    w = params["expand_conv"]["w"]                     # (fw, C_in, C)
    wp = w * a_i.reshape(1, c_in, 1)
    bias = jnp.einsum("kco,c->o", w, b_i.reshape(-1))
    s_e, t_e = _fold_bn(params["expand_bn"], state["expand_bn"])
    t_e = t_e + bias.reshape(1, -1) * s_e

    vm = pltpu.VMEM
    conv_ins = [
        (wp.reshape(fw * c_in, c_),
         pl.BlockSpec((fw * c_in, c_), _full, memory_space=vm)),
        (s_e, pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (t_e, pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]
    local_ins, local_aux = _local_ins_form(form, lp, gab_state, sym_idx,
                                           con_idx, j_, c_)
    ins = conv_ins + local_ins \
        + _global_ins_form(form, gp, gab_state, j_, c_, k, inter, g_ch,
                           score_block=score_block) \
        + _concat_ins(gab_params, gab_state, c_)

    xf = x.astype(jnp.float32).reshape(b_, t_in * j_, c_in)
    out = pl.pallas_call(
        functools.partial(_kernel_level, fw=fw, dilation=1,
                          res_off=-1, t_out=t_out, num_heads=k,
                          inter=inter, g_ch=g_ch, j=j_, local_aux=local_aux,
                          tiers=tiers, interpret=interpret, form=form,
                          softmax_group=softmax_group,
                          apply_block=apply_block,
                          score_block=score_block, has_mid=False),
        out_shape=jax.ShapeDtypeStruct((b_, t_out * j_, 2 * c_),
                                       jnp.float32),
        grid=(b_,),
        in_specs=[pl.BlockSpec((1, t_in * j_, c_in), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [spec for _, spec in ins],
        out_specs=pl.BlockSpec((1, t_out * j_, 2 * c_), lambda i: (i, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, *[arr for arr, _ in ins])
    return out.reshape(b_, t_out, j_, 2 * c_)
