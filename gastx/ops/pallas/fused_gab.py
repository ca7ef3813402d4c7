"""Fused GraphAttentionBlock — Pallas TPU kernels (eval mode).

Fuses the ENTIRE graph-attention block (reference model/gast_net.py:8-33):

    x (TM, J, C) --+-- local: sym/con semantic graph convs -> BN -> ReLU
                   |          -> 2C->C concat matmul -> BN -> ReLU
                   +-- global: fused multi-head attention (theta/phi/g,
                   |          rank-1 scores, softmax + C_k, per-head apply,
                   |          head concat, K*G->C matmul) -> BN -> ReLU
                   +-- residual
    concat [x, local, global] (3C) -> 3C->2C matmul -> BN -> ReLU -> (TM,J,2C)

per row-tile entirely in VMEM: x is read from HBM once and only the (TM, J,
2C) block output is written back — the XLA path round-trips ~10 intermediate
(B,T,J,C) tensors through HBM. All BNs are pre-folded to scale/shift (eval
mode); training uses the XLA path.

The local branch exploits the sparsity of the masked softmax (VERDICT r1
item 7): the sym/con adjacencies have static row degree <= D (2 for mirror
symmetry, ~4 for the kinematic tree), so the per-channel (C,J,J) einsum of
the XLA path becomes J*D static-index vector FMAs — the softmax weights
(input-independent, parameter-derived) are computed on the host side of the
pallas_call and land in VMEM as dense (J, D, C) tables.

The 3C->2C / 2C->C concat matmuls are computed as sums of per-piece matmuls
(x@W[:C] + local@W[C:2C] + ...) so no lane-axis concatenation happens
in-kernel.

VMEM budget: weights are resident — 4C^2 (sym/con W0/W1) + 2C^2 (local cat)
+ 6C^2 (gab cat) + ~2.5C^2 (attention) floats ~= 13 MB at C=512, which does
NOT leave room for activation tiles in the 16 MB VMEM of one whole-block
kernel. Two entry points therefore exist:

  * ``fused_gab``       — ONE kernel, C <= MAX_FUSED_CHANNELS (256): levels
                          0-1 of the 27-frame config, 0-2 of 81f, 0-3 of 243f.
  * ``fused_gab_split`` — TWO kernels (local branch; global branch + block
                          concat), each holding only its own ~6.3/10.4 MB of
                          weights: covers C <= MAX_SPLIT_CHANNELS (512), i.e.
                          the widest level of every shipped architecture. x is
                          read twice and the (TM, J, C) local tensor makes one
                          HBM round-trip — still ~5x less traffic than XLA's
                          intermediate chain.

The wiring (gastx/ops/graph.py graph_attention_block) picks whole-block,
then split, then the XLA path by channel width.

Mosaic constraints honored (same bisection as global_attn.py): no 4-D
small-lane tensors, basic static indexing only, per-head block-column
projections, TM-batched dot_general for the attention application.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gastx.ops.graph import _MASK_FILL, _local_gather_tables
from gastx.ops.pallas.precision import kdot, kdot_general, tiers_from_pairs

MAX_FUSED_CHANNELS = 256
MAX_SPLIT_CHANNELS = 512

# Every matmul in the fused block, keyed by the model's precision-override
# op classes (gastx/models/config.py TPU_MIXED_PRECISION_OVERRIDES). Both
# W0/W1 semantic-conv matmuls are "local_sem", matching the XLA path
# (gastx/ops/graph.py:105-106); the XLA "local_off" class is the off-diag
# einsum contraction, which these kernels realize as dot-free FMAs.
KERNEL_OPS = ("local_sem", "local_cat", "attn_proj",
              "attn_score", "attn_apply", "attn_cat", "gab_cat")

# Measurement-only surgical removals understood by the kernel bodies
# (scripts/perf_lab36.py); "" is production. Validated at the entry
# points: an unknown value would match no branch and silently compile
# the FULL production kernel, so an ablation run could report numbers
# for a removal that never happened (r4 advisor finding).
ABLATE_VALUES = ("", "no_locloop", "no_softmax", "no_scores", "no_apply",
                 "no_global", "no_local")


def _check_ablate(ablate: str) -> None:
    if ablate not in ABLATE_VALUES:
        raise ValueError(
            f"unknown ablate value {ablate!r}; valid: {ABLATE_VALUES}")


def _fold_bn(params_bn: Dict, state_bn: Dict, eps: float = 1e-5):
    """BatchNorm eval-mode affine fold: y = x*scale + shift."""
    scale = params_bn["scale"] / jnp.sqrt(state_bn["var"] + eps)
    shift = params_bn["bias"] - state_bn["mean"] * scale
    return scale.reshape(1, -1), shift.reshape(1, -1)


def _local_weight_tables(e: jnp.ndarray, mask_idx, j: int):
    """Softmax edge weights -> dense (J, C) self + (J, D, C) neighbor tables.

    Equivalent to the masked softmax of gastx.ops.graph.sem_ch_graph_conv
    (reference model/local_attention.py:35-46): rows softmax over the -9e15
    filled (C, J, J) logits; diag -> w_self, off-diag -> w_nbr (zero-padded
    to the static max row degree D).
    """
    c_out = e.shape[0]
    logits = jnp.full((c_out, j * j), _MASK_FILL, jnp.float32)
    logits = logits.at[:, np.asarray(mask_idx)].set(e)
    adj = jax.nn.softmax(logits.reshape(c_out, j, j), axis=2)  # (C, J, J)

    slot, col, valid, is_diag = _local_gather_tables(
        tuple(int(i) for i in np.asarray(mask_idx)), j)
    w_self = jnp.diagonal(adj, axis1=1, axis2=2).T           # (J, C)
    # (J, D, C): adj[:, j, col[j, d]] masked to valid non-diag entries
    w_nbr = jnp.transpose(adj, (1, 2, 0))[
        np.arange(j)[:, None], col]                           # (J, D, C)
    w_nbr = jnp.where((valid & ~is_diag)[..., None], w_nbr, 0.0)
    return w_self, w_nbr, col, (valid & ~is_diag)


def _roll_tables(w_nbr: jnp.ndarray, col, valid, j: int):
    """Regroup the (J, D, C) neighbor tables by sublane shift.

    The v2 kernel form computes the neighbor aggregation as full-tensor
    rolls instead of J*D per-joint FMAs: ``h1[m, col[q, d], c]`` equals
    ``roll(h1, -s, axis=1)[m, q, c]`` with ``s = (col[q, d] - q) mod J``,
    and the skeleton graphs only use a handful of distinct shifts (the
    mirror-symmetry pairs share one +/-s, the kinematic tree mostly
    parent/child +/-1 plus a few hip/shoulder jumps). Returns the sorted
    static shift tuple and a stacked (S, J, C) weight table with
    ``table[si, q] = sum_d w_nbr[q, d] over entries whose shift == s_si``.
    """
    col = np.asarray(col)
    valid = np.asarray(valid)
    d = col.shape[1]
    shift_of = (col - np.arange(j)[:, None]) % j      # (J, D)
    shifts = sorted({int(s) for q in range(j) for dd in range(d)
                     if valid[q, dd] for s in (shift_of[q, dd],)})
    if not shifts:  # degenerate layout with no off-diagonal edges
        return (0,), jnp.zeros((1, j, w_nbr.shape[-1]), w_nbr.dtype)
    masks = np.stack([(shift_of == s) & valid for s in shifts])  # (S, J, D)
    table = jnp.einsum("sqd,qdc->sqc", masks.astype(w_nbr.dtype), w_nbr)
    return tuple(shifts), table


# --------------------------------------------------------------------------
# Kernel branch bodies, shared by the whole-block and split kernels. Each
# takes the flat (TM*J, C) activations plus its VMEM weight refs and the
# per-op `dot` closures, and returns flat activations. Two forms exist:
#
#   * "v1" — the r3-certified form: per-joint static-slice FMAs for the
#     local aggregation (J*(1+D) small VPU ops per sem conv), separate
#     dots per weight matrix, one rank-1 score dot per head.
#   * "v2" — compute-restructured (perf_lab17 attribution: the kernel
#     path is compute/overhead-bound, not HBM-bound): the 4 local
#     sem-conv dots merge into one (C, 4C) dot, the neighbor aggregation
#     becomes ~O(distinct shifts) full-tensor rolls (see _roll_tables),
#     theta/phi/g merge into one (C, K*(2I+G)) dot, and the 2K rank-1
#     score dots collapse into two block-diagonal (K*I, K) dots. Same
#     math; the only reordered f32 sums are the neighbor adds (grouped
#     by shift instead of by d), so v1/v2 agree to roundoff.
#   * "fold" — v1 local branch + score-FOLDED global branch (r5,
#     perf_lab36 attribution: at the shipped 243f/81f routes the per-head
#     rank-1 score dots cost ~138 ms route-wide and theta/phi exist ONLY
#     to feed them). Since there is no nonlinearity between the
#     projection and the score, sa_k = (x @ Wt_k + bt_k) @ pt_k
#     == x @ (Wt_k @ pt_k) + bt_k.pt_k: the theta/phi projections AND
#     all 2K per-head score dots collapse into TWO thin (C, K) dots
#     against statically folded weights (host-side, HIGHEST precision).
#     Exact in exact arithmetic; the f32 contraction regroups (C-sum of
#     I-sums -> one C-sum), so scores agree to roundoff, NOT bitwise —
#     adoption requires its own on-chip error certification (same class
#     of divergence as gab_score_block, lab24/lab29 harness).
#     Reference semantics: model/global_attention.py:60-130 (the
#     concat_project rank-1 attention this folds).
# --------------------------------------------------------------------------

_LOCAL_NREFS = {"v1": 15, "v2": 12, "fold": 15}
_GLOBAL_NREFS = {"v1": 12, "v2": 8, "fold": 10}


def _local_branch(xr, tm, j, c, dot,
                  w0s_ref, w1s_ref, wself_s_ref, wnbr_s_ref,
                  w0c_ref, w1c_ref, wself_c_ref, wnbr_c_ref,
                  bnsym_scale_ref, bnsym_shift_ref, bncon_scale_ref,
                  bncon_shift_ref, lcat_w_ref, lcat_scale_ref,
                  lcat_shift_ref, col_sym, col_con, ablate=""):
    # ---- local branch: two sparse semantic graph convs ----
    # ``ablate`` is a measurement-only hook (perf_lab36): "" in production.
    def sem_conv(w0_ref, w1_ref, wself_ref, wnbr_ref, col):
        h0 = dot(xr, w0_ref[:], "local_sem").reshape(tm, j, c)
        h1 = dot(xr, w1_ref[:], "local_sem").reshape(tm, j, c)
        rows = []
        d = col.shape[1]
        for jq in range(j):
            acc = h0[:, jq, :] * wself_ref[jq, :]
            if ablate != "no_locloop":
                for dd in range(d):
                    acc = acc + (h1[:, int(col[jq, dd]), :]
                                 * wnbr_ref[jq, dd, :])
            rows.append(acc)
        return jnp.stack(rows, axis=1)              # (TM, J, C)

    a = sem_conv(w0s_ref, w1s_ref, wself_s_ref, wnbr_s_ref, col_sym)
    b = sem_conv(w0c_ref, w1c_ref, wself_c_ref, wnbr_c_ref, col_con)
    a = jnp.maximum(a.reshape(tm * j, c) * bnsym_scale_ref[:]
                    + bnsym_shift_ref[:], 0.0)
    b = jnp.maximum(b.reshape(tm * j, c) * bncon_scale_ref[:]
                    + bncon_shift_ref[:], 0.0)
    # 2C->C concat matmul as a sum of halves (no lane concat in-kernel)
    local = dot(a, lcat_w_ref[0:c, :], "local_cat") + \
        dot(b, lcat_w_ref[c:2 * c, :], "local_cat")
    return jnp.maximum(local * lcat_scale_ref[:] + lcat_shift_ref[:], 0.0)


def _local_branch_v2(xr, tm, j, c, dot,
                     wloc_ref, wself_s_ref, wroll_s_ref,
                     wself_c_ref, wroll_c_ref,
                     bnsym_scale_ref, bnsym_shift_ref, bncon_scale_ref,
                     bncon_shift_ref, lcat_w_ref, lcat_scale_ref,
                     lcat_shift_ref, shifts_sym, shifts_con):
    # One (C, 4C) dot replaces the four (C, C) sem-conv dots; columns are
    # [W0_sym | W1_sym | W0_con | W1_con], so each slice below is bitwise
    # the corresponding v1 dot.
    h = dot(xr, wloc_ref[:], "local_sem")

    def agg(h0, h1, wself_ref, wroll_ref, shifts):
        acc = h0 * wself_ref[:]
        for si, s in enumerate(shifts):
            # roll(h1, -s)[m, q] == h1[m, (q + s) % j] == h1[m, col[q, d]]
            acc = acc + jnp.roll(h1, -s, axis=1) * wroll_ref[si]
        return acc

    a = agg(h[:, 0:c].reshape(tm, j, c), h[:, c:2 * c].reshape(tm, j, c),
            wself_s_ref, wroll_s_ref, shifts_sym)
    b = agg(h[:, 2 * c:3 * c].reshape(tm, j, c),
            h[:, 3 * c:4 * c].reshape(tm, j, c),
            wself_c_ref, wroll_c_ref, shifts_con)
    a = jnp.maximum(a.reshape(tm * j, c) * bnsym_scale_ref[:]
                    + bnsym_shift_ref[:], 0.0)
    b = jnp.maximum(b.reshape(tm * j, c) * bncon_scale_ref[:]
                    + bncon_shift_ref[:], 0.0)
    local = dot(a, lcat_w_ref[0:c, :], "local_cat") + \
        dot(b, lcat_w_ref[c:2 * c, :], "local_cat")
    return jnp.maximum(local * lcat_scale_ref[:] + lcat_shift_ref[:], 0.0)


def _global_branch(xr, tm, j, c, dot, dotg,
                   theta_w_ref, phi_w_ref, g_w_ref, theta_b_ref, phi_b_ref,
                   g_b_ref, proj_t_ref, proj_p_ref, ck_ref, acat_w_ref,
                   acat_scale_ref, acat_shift_ref,
                   num_heads, inter, g_ch, softmax_group=1,
                   apply_block=False, score_block=False, ablate=""):
    # ---- global branch (same structure as global_attn._kernel) ----
    # ``softmax_group`` batches the per-head LeakyReLU/softmax/+C_k chains
    # across G heads at a time by concatenating the G (TM, J, J) score
    # tensors along the sublane (query-joint) axis: ONE 7-op VPU chain on
    # a (TM, G*J, J) tensor instead of G chains on 128-lane-padded
    # (TM, J, J) slivers. Bitwise-identical math — perf_lab20 measured
    # the 8 per-head chains at 8.1 ms of gab0's 32.4 ms (per-op dispatch
    # overhead on tiny tiles), which this amortizes.
    # ``apply_block`` further replaces the group's G per-head apply dots
    # with ONE blocked dot (TM, G*J, J) @ (TM, J, G*g_ch) and extracts
    # the G diagonal (J, g_ch) blocks: each block's contraction is the
    # same f32 sum as its per-head dot (bitwise), and since per-head
    # dots pad g_ch -> 128 lanes anyway, the blocked dot's extra
    # off-diagonal volume is already being paid as padding.
    # ``score_block`` replaces the 2K rank-1 per-head score dots with TWO
    # block-diagonal (K*I, K) dots (the v2 form's one dispatch win, without
    # its slower roll-based local branch): the off-block weights are exact
    # zeros so the products match, but the interleaved zero slots regroup
    # the f32 accumulation tree — scores agree to 1-2 ulp, NOT bitwise
    # (adoption therefore needs its own on-chip error certification).
    theta = dot(xr, theta_w_ref[:], "attn_proj") + theta_b_ref[:]
    phi = dot(xr, phi_w_ref[:], "attn_proj") + phi_b_ref[:]
    gx = (dot(xr, g_w_ref[:], "attn_proj")
          + g_b_ref[:]).reshape(tm, j, num_heads * g_ch)
    if score_block:
        sa_all = dot(theta, proj_t_ref[:], "attn_score")     # (TM*J, K)
        sb_all = dot(phi, proj_p_ref[:], "attn_score")

    grp = max(1, min(softmax_group, num_heads))
    head_outs = []
    for k0 in range(0, num_heads, grp):
        ks = range(k0, min(k0 + grp, num_heads))
        if ablate == "no_apply":
            head_outs.extend(
                gx[:, :, k * g_ch:(k + 1) * g_ch] for k in ks)
            continue
        fs = []
        for k in ks:
            if ablate == "no_scores":
                sa = theta[:, k * inter:k * inter + 1].reshape(tm, j, 1)
                sb = jnp.zeros((tm, j, 1), jnp.float32)
            elif score_block:
                sa = sa_all[:, k:k + 1].reshape(tm, j, 1)
                sb = sb_all[:, k:k + 1].reshape(tm, j, 1)
            else:
                tk = theta[:, k * inter:(k + 1) * inter]
                pk = phi[:, k * inter:(k + 1) * inter]
                sa = dot(tk, proj_t_ref[:, k:k + 1],
                         "attn_score").reshape(tm, j, 1)
                sb = dot(pk, proj_p_ref[:, k:k + 1],
                         "attn_score").reshape(tm, j, 1)
            fs.append(sa + jnp.swapaxes(sb, 1, 2))
        f = fs[0] if len(fs) == 1 else jnp.concatenate(fs, axis=1)
        f = jnp.where(f > 0, f, 0.2 * f)            # LeakyReLU(0.2)
        if ablate == "no_softmax":
            attn = f + ck_ref[k0 * j:(k0 + len(fs)) * j, :].reshape(
                1, len(fs) * j, j)
        else:
            f = f - jnp.max(f, axis=2, keepdims=True)
            ef = jnp.exp(f)
            attn = ef / jnp.sum(ef, axis=2, keepdims=True)
            attn = attn + ck_ref[k0 * j:(k0 + len(fs)) * j, :].reshape(
                1, len(fs) * j, j)
        if apply_block and len(fs) > 1:
            gx_grp = gx[:, :, k0 * g_ch:(k0 + len(fs)) * g_ch]
            out_blk = dotg(attn, gx_grp,
                           (((2,), (1,)), ((0,), (0,))), "attn_apply")
            for i, k in enumerate(ks):
                head_outs.append(
                    out_blk[:, i * j:(i + 1) * j,
                            i * g_ch:(i + 1) * g_ch])
        else:
            for i, k in enumerate(ks):
                ak = attn if len(fs) == 1 else attn[:, i * j:(i + 1) * j, :]
                gk = gx[:, :, k * g_ch:(k + 1) * g_ch]
                head_outs.append(dotg(
                    ak, gk, (((2,), (1,)), ((0,), (0,))), "attn_apply"))
    gy = jnp.concatenate(head_outs, axis=2)
    gy = dot(gy.reshape(tm * j, num_heads * g_ch), acat_w_ref[:], "attn_cat")
    return jnp.maximum(gy * acat_scale_ref[:] + acat_shift_ref[:], 0.0)


def _global_branch_v2(xr, tm, j, c, dot, dotg,
                      wqkv_ref, bqkv_ref, projt_blk_ref, projp_blk_ref,
                      ck_ref, acat_w_ref, acat_scale_ref, acat_shift_ref,
                      num_heads, inter, g_ch):
    # One (C, K*(2I+G)) dot replaces the theta/phi/g projections; two
    # block-diagonal (K*I, K) dots replace the 2K rank-1 per-head score
    # dots (the off-block weights are exact zeros, so each score column
    # equals its v1 per-head dot bitwise).
    ki = num_heads * inter
    h = dot(xr, wqkv_ref[:], "attn_proj") + bqkv_ref[:]
    theta = h[:, 0:ki]
    phi = h[:, ki:2 * ki]
    gx = h[:, 2 * ki:].reshape(tm, j, num_heads * g_ch)
    sa_all = dot(theta, projt_blk_ref[:], "attn_score")      # (TM*J, K)
    sb_all = dot(phi, projp_blk_ref[:], "attn_score")

    head_outs = []
    for k in range(num_heads):
        sa = sa_all[:, k:k + 1].reshape(tm, j, 1)
        sb = sb_all[:, k:k + 1].reshape(tm, j, 1)
        f = sa + jnp.swapaxes(sb, 1, 2)
        f = jnp.where(f > 0, f, 0.2 * f)            # LeakyReLU(0.2)
        f = f - jnp.max(f, axis=2, keepdims=True)
        ef = jnp.exp(f)
        attn = ef / jnp.sum(ef, axis=2, keepdims=True)
        attn = attn + ck_ref[k * j:(k + 1) * j, :]
        gk = gx[:, :, k * g_ch:(k + 1) * g_ch]
        head_outs.append(dotg(
            attn, gk, (((2,), (1,)), ((0,), (0,))), "attn_apply"))
    gy = jnp.concatenate(head_outs, axis=2)
    gy = dot(gy.reshape(tm * j, num_heads * g_ch), acat_w_ref[:], "attn_cat")
    return jnp.maximum(gy * acat_scale_ref[:] + acat_shift_ref[:], 0.0)


def _global_branch_fold(xr, tm, j, c, dot, dotg,
                        wsa_ref, wsb_ref, bsa_ref, bsb_ref, g_w_ref,
                        g_b_ref, ck_ref, acat_w_ref, acat_scale_ref,
                        acat_shift_ref, num_heads, g_ch,
                        softmax_group=1, apply_block=False, ablate=""):
    # Score-folded global branch (form="fold"): the theta/phi projections
    # and the 2K rank-1 score dots are pre-contracted into wsa/wsb
    # (C, K) host-side (see _global_ins_fold), so the in-kernel score
    # work is TWO thin dots total. gx and everything downstream of the
    # scores (grouped softmax chains, per-head apply dots, attn_cat) is
    # the v1 body unchanged.
    gx = (dot(xr, g_w_ref[:], "attn_proj")
          + g_b_ref[:]).reshape(tm, j, num_heads * g_ch)
    # 3-D (tm, j, K) + per-head LANE slices — the exact slicing pattern
    # the production gx path uses. The first-draft 2-D (TM*J, K) column
    # slices blew the 16M scoped-VMEM stack at the pbatch TM=16 tiles
    # (17.70M, AOT OOM); same elements, different Mosaic allocation.
    sa_all = (dot(xr, wsa_ref[:], "attn_score")
              + bsa_ref[:]).reshape(tm, j, num_heads)
    sb_all = (dot(xr, wsb_ref[:], "attn_score")
              + bsb_ref[:]).reshape(tm, j, num_heads)

    grp = max(1, min(softmax_group, num_heads))
    head_outs = []
    for k0 in range(0, num_heads, grp):
        ks = range(k0, min(k0 + grp, num_heads))
        if ablate == "no_apply":
            head_outs.extend(
                gx[:, :, k * g_ch:(k + 1) * g_ch] for k in ks)
            continue
        fs = []
        for k in ks:
            if ablate == "no_scores":
                sa = sa_all[:, :, 0:1]
                sb = jnp.zeros((tm, j, 1), jnp.float32)
            else:
                sa = sa_all[:, :, k:k + 1]
                sb = sb_all[:, :, k:k + 1]
            fs.append(sa + jnp.swapaxes(sb, 1, 2))
        f = fs[0] if len(fs) == 1 else jnp.concatenate(fs, axis=1)
        f = jnp.where(f > 0, f, 0.2 * f)            # LeakyReLU(0.2)
        if ablate == "no_softmax":
            attn = f + ck_ref[k0 * j:(k0 + len(fs)) * j, :].reshape(
                1, len(fs) * j, j)
        else:
            f = f - jnp.max(f, axis=2, keepdims=True)
            ef = jnp.exp(f)
            attn = ef / jnp.sum(ef, axis=2, keepdims=True)
            attn = attn + ck_ref[k0 * j:(k0 + len(fs)) * j, :].reshape(
                1, len(fs) * j, j)
        if apply_block and len(fs) > 1:
            gx_grp = gx[:, :, k0 * g_ch:(k0 + len(fs)) * g_ch]
            out_blk = dotg(attn, gx_grp,
                           (((2,), (1,)), ((0,), (0,))), "attn_apply")
            for i, k in enumerate(ks):
                head_outs.append(
                    out_blk[:, i * j:(i + 1) * j,
                            i * g_ch:(i + 1) * g_ch])
        else:
            for i, k in enumerate(ks):
                ak = attn if len(fs) == 1 else attn[:, i * j:(i + 1) * j, :]
                gk = gx[:, :, k * g_ch:(k + 1) * g_ch]
                head_outs.append(dotg(
                    ak, gk, (((2,), (1,)), ((0,), (0,))), "attn_apply"))
    gy = jnp.concatenate(head_outs, axis=2)
    gy = dot(gy.reshape(tm * j, num_heads * g_ch), acat_w_ref[:], "attn_cat")
    return jnp.maximum(gy * acat_scale_ref[:] + acat_shift_ref[:], 0.0)


def _run_local(form, xr, tm, j, c, dot, lrefs, local_aux, ablate=""):
    if ablate == "no_local":
        return jnp.maximum(xr, 0.0)
    if form == "v2":
        return _local_branch_v2(xr, tm, j, c, dot, *lrefs, *local_aux)
    return _local_branch(xr, tm, j, c, dot, *lrefs, *local_aux,
                         ablate=ablate)


def _run_global(form, xr, tm, j, c, dot, dotg, grefs,
                num_heads, inter, g_ch, softmax_group=1,
                apply_block=False, score_block=False, ablate=""):
    if ablate == "no_global":
        return jnp.maximum(xr, 0.0)
    if form == "fold":
        return _global_branch_fold(xr, tm, j, c, dot, dotg, *grefs,
                                   num_heads=num_heads, g_ch=g_ch,
                                   softmax_group=softmax_group,
                                   apply_block=apply_block, ablate=ablate)
    if form == "v2":
        return _global_branch_v2(xr, tm, j, c, dot, dotg, *grefs,
                                 num_heads=num_heads, inter=inter,
                                 g_ch=g_ch)
    return _global_branch(xr, tm, j, c, dot, dotg, *grefs,
                          num_heads=num_heads, inter=inter, g_ch=g_ch,
                          softmax_group=softmax_group,
                          apply_block=apply_block,
                          score_block=score_block, ablate=ablate)


def _block_concat(xr, local, globl, c, dot,
                  gcat_w_ref, gcat_scale_ref, gcat_shift_ref):
    # ---- block concat: [x, local, global] @ (3C -> 2C) ----
    y = dot(xr, gcat_w_ref[0:c, :], "gab_cat") + \
        dot(local, gcat_w_ref[c:2 * c, :], "gab_cat") + \
        dot(globl, gcat_w_ref[2 * c:3 * c, :], "gab_cat")
    return jnp.maximum(y * gcat_scale_ref[:] + gcat_shift_ref[:], 0.0)


def _make_dots(tiers, interpret):
    def dot(a, b, op):  # per-op-class explicit Mosaic precision
        return kdot(a, b, tiers[op], interpret=interpret)

    def dotg(a, b, dims, op):
        return kdot_general(a, b, dims, tiers[op], interpret=interpret)
    return dot, dotg


def _kernel(x_ref, *refs,
            num_heads: int, inter: int, g_ch: int, j: int,
            local_aux, tiers, interpret: bool, form: str,
            softmax_group: int = 1, apply_block: bool = False,
            score_block: bool = False, ablate: str = ""):
    out_ref = refs[-1]
    nl = _LOCAL_NREFS[form]
    lrefs = refs[:nl]
    grefs = refs[nl:nl + _GLOBAL_NREFS[form]]
    crefs = refs[nl + _GLOBAL_NREFS[form]:-1]
    tm = x_ref.shape[0]
    c = x_ref.shape[2]
    # bf16-storage inputs upcast at the VMEM boundary: HBM moves half the
    # bytes, in-kernel compute stays f32 (weights are prepped f32).
    xr = x_ref[:].astype(jnp.float32).reshape(tm * j, c)
    dot, dotg = _make_dots(tiers, interpret)

    local = _run_local(form, xr, tm, j, c, dot, lrefs, local_aux, ablate)
    globl = _run_global(form, xr, tm, j, c, dot, dotg, grefs,
                        num_heads, inter, g_ch, softmax_group,
                        apply_block, score_block, ablate)
    y = _block_concat(xr, local, globl, c, dot, *crefs)
    out_ref[:] = y.reshape(tm, j, 2 * c).astype(out_ref.dtype)


def _kernel_local(x_ref, *refs, j: int, local_aux, tiers,
                  interpret: bool, form: str):
    out_ref = refs[-1]
    lrefs = refs[:-1]
    tm = x_ref.shape[0]
    c = x_ref.shape[2]
    xr = x_ref[:].astype(jnp.float32).reshape(tm * j, c)
    dot, _ = _make_dots(tiers, interpret)
    local = _run_local(form, xr, tm, j, c, dot, lrefs, local_aux)
    out_ref[:] = local.reshape(tm, j, c).astype(out_ref.dtype)


def _kernel_globcat(x_ref, local_ref, *refs,
                    num_heads: int, inter: int, g_ch: int, j: int,
                    tiers, interpret: bool, form: str,
                    softmax_group: int = 1, apply_block: bool = False,
                    score_block: bool = False):
    out_ref = refs[-1]
    grefs = refs[:_GLOBAL_NREFS[form]]
    crefs = refs[_GLOBAL_NREFS[form]:-1]
    tm = x_ref.shape[0]
    c = x_ref.shape[2]
    xr = x_ref[:].astype(jnp.float32).reshape(tm * j, c)
    local = local_ref[:].astype(jnp.float32).reshape(tm * j, c)
    dot, dotg = _make_dots(tiers, interpret)
    globl = _run_global(form, xr, tm, j, c, dot, dotg, grefs,
                        num_heads, inter, g_ch, softmax_group,
                        apply_block, score_block)
    y = _block_concat(xr, local, globl, c, dot, *crefs)
    out_ref[:] = y.reshape(tm, j, 2 * c).astype(out_ref.dtype)


# --------------------------------------------------------------------------
# Host-side packing shared by both entry points.
# --------------------------------------------------------------------------

def _full(*_):
    return (0, 0)


def _full3(*_):
    return (0, 0, 0)


def _local_ins(lp, state, sym_idx, con_idx, j_, c_):
    """(array, spec) pairs for the local branch + the static col tables."""
    wself_s, wnbr_s, col_s, _ = _local_weight_tables(
        lp["sym"]["e"], sym_idx, j_)
    wself_c, wnbr_c, col_c, _ = _local_weight_tables(
        lp["con"]["e"], con_idx, j_)
    bnsym = _fold_bn(lp["bn_sym"], state["local"]["bn_sym"])
    bncon = _fold_bn(lp["bn_con"], state["local"]["bn_con"])
    lcat = _fold_bn(lp["cat_bn"], state["local"]["cat_bn"])
    vm = pltpu.VMEM
    ins = [
        (lp["sym"]["W0"], pl.BlockSpec((c_, c_), _full, memory_space=vm)),
        (lp["sym"]["W1"], pl.BlockSpec((c_, c_), _full, memory_space=vm)),
        (wself_s, pl.BlockSpec((j_, c_), _full, memory_space=vm)),
        (wnbr_s, pl.BlockSpec(wnbr_s.shape, _full3, memory_space=vm)),
        (lp["con"]["W0"], pl.BlockSpec((c_, c_), _full, memory_space=vm)),
        (lp["con"]["W1"], pl.BlockSpec((c_, c_), _full, memory_space=vm)),
        (wself_c, pl.BlockSpec((j_, c_), _full, memory_space=vm)),
        (wnbr_c, pl.BlockSpec(wnbr_c.shape, _full3, memory_space=vm)),
        (bnsym[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bnsym[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bncon[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bncon[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (lp["cat_w"], pl.BlockSpec((2 * c_, c_), _full, memory_space=vm)),
        (lcat[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (lcat[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]
    return ins, np.asarray(col_s), np.asarray(col_c)


def _local_ins_v2(lp, state, sym_idx, con_idx, j_, c_):
    """v2-form local inputs: merged (C, 4C) sem-conv weights + shift-grouped
    roll tables. Returns (ins, (shifts_sym, shifts_con))."""
    wself_s, wnbr_s, col_s, valid_s = _local_weight_tables(
        lp["sym"]["e"], sym_idx, j_)
    wself_c, wnbr_c, col_c, valid_c = _local_weight_tables(
        lp["con"]["e"], con_idx, j_)
    shifts_s, wroll_s = _roll_tables(wnbr_s, col_s, valid_s, j_)
    shifts_c, wroll_c = _roll_tables(wnbr_c, col_c, valid_c, j_)
    wloc = jnp.concatenate([lp["sym"]["W0"], lp["sym"]["W1"],
                            lp["con"]["W0"], lp["con"]["W1"]], axis=1)
    bnsym = _fold_bn(lp["bn_sym"], state["local"]["bn_sym"])
    bncon = _fold_bn(lp["bn_con"], state["local"]["bn_con"])
    lcat = _fold_bn(lp["cat_bn"], state["local"]["cat_bn"])
    vm = pltpu.VMEM
    ins = [
        (wloc, pl.BlockSpec((c_, 4 * c_), _full, memory_space=vm)),
        (wself_s, pl.BlockSpec((j_, c_), _full, memory_space=vm)),
        (wroll_s, pl.BlockSpec(wroll_s.shape, _full3, memory_space=vm)),
        (wself_c, pl.BlockSpec((j_, c_), _full, memory_space=vm)),
        (wroll_c, pl.BlockSpec(wroll_c.shape, _full3, memory_space=vm)),
        (bnsym[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bnsym[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bncon[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (bncon[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (lp["cat_w"], pl.BlockSpec((2 * c_, c_), _full, memory_space=vm)),
        (lcat[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (lcat[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]
    return ins, (shifts_s, shifts_c)


def _local_ins_form(form, lp, state, sym_idx, con_idx, j_, c_):
    """(ins, local_aux) for either kernel form; local_aux is the static
    tuple the form's branch body takes after its refs."""
    if form == "v2":
        return _local_ins_v2(lp, state, sym_idx, con_idx, j_, c_)
    ins, col_s, col_c = _local_ins(lp, state, sym_idx, con_idx, j_, c_)
    return ins, (col_s, col_c)


def _blkdiag(p, k, inter):  # (K, I) -> (K*I, K): head h's vector in column h
    eye = jnp.eye(k, dtype=p.dtype)
    return (p[:, :, None] * eye[:, None, :]).reshape(k * inter, k)


def _global_ins(gp, state, j_, c_, k, inter, g_ch, score_block=False):
    acat = _fold_bn(gp["cat_bn"], state["global"]["cat_bn"])
    vm = pltpu.VMEM

    def cols(w, width):  # (K, C, width) -> (C, K*width), k-major columns
        return jnp.transpose(w, (1, 0, 2)).reshape(c_, k * width)

    # score_block swaps the (I, K) per-head score projections for their
    # block-diagonal (K*I, K) form consumed by the batched score dots.
    if score_block:
        proj_t = _blkdiag(gp["proj_theta"], k, inter)
        proj_p = _blkdiag(gp["proj_phi"], k, inter)
        proj_spec = pl.BlockSpec((k * inter, k), _full, memory_space=vm)
    else:
        proj_t = jnp.transpose(gp["proj_theta"])
        proj_p = jnp.transpose(gp["proj_phi"])
        proj_spec = pl.BlockSpec((inter, k), _full, memory_space=vm)

    return [
        (cols(gp["theta_w"], inter),
         pl.BlockSpec((c_, k * inter), _full, memory_space=vm)),
        (cols(gp["phi_w"], inter),
         pl.BlockSpec((c_, k * inter), _full, memory_space=vm)),
        (cols(gp["g_w"], g_ch),
         pl.BlockSpec((c_, k * g_ch), _full, memory_space=vm)),
        (gp["theta_b"].reshape(1, k * inter),
         pl.BlockSpec((1, k * inter), _full, memory_space=vm)),
        (gp["phi_b"].reshape(1, k * inter),
         pl.BlockSpec((1, k * inter), _full, memory_space=vm)),
        (gp["g_b"].reshape(1, k * g_ch),
         pl.BlockSpec((1, k * g_ch), _full, memory_space=vm)),
        (proj_t, proj_spec),
        (proj_p, proj_spec),
        (gp["C_k"].reshape(k * j_, j_),
         pl.BlockSpec((k * j_, j_), _full, memory_space=vm)),
        (gp["cat_w"], pl.BlockSpec((k * g_ch, c_), _full, memory_space=vm)),
        (acat[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (acat[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]


def _global_ins_fold(gp, state, j_, c_, k, g_ch):
    """fold-form global inputs: the theta/phi projections pre-contracted
    with their rank-1 score vectors. sa_k = (x @ Wt_k + bt_k) @ pt_k
    == x @ (Wt_k @ pt_k) + bt_k.pt_k, so the kernel's score work becomes
    two (C, K) dots. The fold runs host-side at HIGHEST precision (the
    weights are static; only the kernel's C-long contraction regroups the
    f32 sums vs v1's I-long score dots). Works unchanged on _pbatch_tree
    output: heads_diag keeps off-sample blocks exactly zero, so the
    folded (P*C, P*K) weight is block-diagonal over packed frames."""
    acat = _fold_bn(gp["cat_bn"], state["global"]["cat_bn"])
    vm = pltpu.VMEM
    hi = jax.lax.Precision.HIGHEST

    def cols(w, width):  # (K, C, width) -> (C, K*width), k-major columns
        return jnp.transpose(w, (1, 0, 2)).reshape(c_, k * width)

    wsa = jnp.einsum("kci,ki->ck", gp["theta_w"], gp["proj_theta"],
                     precision=hi)
    wsb = jnp.einsum("kci,ki->ck", gp["phi_w"], gp["proj_phi"],
                     precision=hi)
    bsa = jnp.einsum("ki,ki->k", gp["theta_b"], gp["proj_theta"],
                     precision=hi).reshape(1, k)
    bsb = jnp.einsum("ki,ki->k", gp["phi_b"], gp["proj_phi"],
                     precision=hi).reshape(1, k)

    return [
        (wsa, pl.BlockSpec((c_, k), _full, memory_space=vm)),
        (wsb, pl.BlockSpec((c_, k), _full, memory_space=vm)),
        (bsa, pl.BlockSpec((1, k), _full, memory_space=vm)),
        (bsb, pl.BlockSpec((1, k), _full, memory_space=vm)),
        (cols(gp["g_w"], g_ch),
         pl.BlockSpec((c_, k * g_ch), _full, memory_space=vm)),
        (gp["g_b"].reshape(1, k * g_ch),
         pl.BlockSpec((1, k * g_ch), _full, memory_space=vm)),
        (gp["C_k"].reshape(k * j_, j_),
         pl.BlockSpec((k * j_, j_), _full, memory_space=vm)),
        (gp["cat_w"], pl.BlockSpec((k * g_ch, c_), _full, memory_space=vm)),
        (acat[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (acat[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]


def _global_ins_v2(gp, state, j_, c_, k, inter, g_ch):
    """v2-form global inputs: one merged (C, K*(2I+G)) projection weight +
    bias and block-diagonal (K*I, K) score projections."""
    acat = _fold_bn(gp["cat_bn"], state["global"]["cat_bn"])
    vm = pltpu.VMEM

    def cols(w, width):  # (K, C, width) -> (C, K*width), k-major columns
        return jnp.transpose(w, (1, 0, 2)).reshape(c_, k * width)

    wqkv = jnp.concatenate([cols(gp["theta_w"], inter),
                            cols(gp["phi_w"], inter),
                            cols(gp["g_w"], g_ch)], axis=1)
    bqkv = jnp.concatenate([gp["theta_b"].reshape(1, k * inter),
                            gp["phi_b"].reshape(1, k * inter),
                            gp["g_b"].reshape(1, k * g_ch)], axis=1)

    nq = k * (2 * inter + g_ch)
    return [
        (wqkv, pl.BlockSpec((c_, nq), _full, memory_space=vm)),
        (bqkv, pl.BlockSpec((1, nq), _full, memory_space=vm)),
        (_blkdiag(gp["proj_theta"], k, inter),
         pl.BlockSpec((k * inter, k), _full, memory_space=vm)),
        (_blkdiag(gp["proj_phi"], k, inter),
         pl.BlockSpec((k * inter, k), _full, memory_space=vm)),
        (gp["C_k"].reshape(k * j_, j_),
         pl.BlockSpec((k * j_, j_), _full, memory_space=vm)),
        (gp["cat_w"], pl.BlockSpec((k * g_ch, c_), _full, memory_space=vm)),
        (acat[0], pl.BlockSpec((1, c_), _full, memory_space=vm)),
        (acat[1], pl.BlockSpec((1, c_), _full, memory_space=vm)),
    ]


def _global_ins_form(form, gp, state, j_, c_, k, inter, g_ch,
                     score_block=False):
    if form == "fold":
        return _global_ins_fold(gp, state, j_, c_, k, g_ch)
    if form == "v2":
        return _global_ins_v2(gp, state, j_, c_, k, inter, g_ch)
    return _global_ins(gp, state, j_, c_, k, inter, g_ch,
                       score_block=score_block)


def _concat_ins(params, state, c_):
    gcat = _fold_bn(params["cat_bn"], state["cat_bn"])
    vm = pltpu.VMEM
    return [
        (params["cat_w"],
         pl.BlockSpec((3 * c_, 2 * c_), _full, memory_space=vm)),
        (gcat[0], pl.BlockSpec((1, 2 * c_), _full, memory_space=vm)),
        (gcat[1], pl.BlockSpec((1, 2 * c_), _full, memory_space=vm)),
    ]


def _ensure_f32(tree):
    """Upcast a (possibly bf16-storage) param/state subtree to f32: the
    kernels compute in f32 regardless of activation storage dtype, and
    weight HBM traffic is negligible next to activations."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def _tile_rows(x, tile_rows, budget):
    b_, t_, j_, c_ = x.shape
    m_total = b_ * t_
    # Budget against the PADDED channel width: lanes pad C to >=128, so
    # the kernel's scoped-VMEM temporaries stop shrinking below C=128 —
    # a C=32 level at 128 rows would hit the same 31M stack the C=128
    # level did (16M limit).
    tm = tile_rows or max(8, min(128, budget // max(c_, 128)))
    pad = (-m_total) % tm
    xf = x.reshape(m_total, j_, c_)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, j_, c_), x.dtype)], axis=0)
    return xf, tm, m_total, pad


@functools.partial(jax.jit,
                   static_argnames=("sym_idx", "con_idx", "interpret",
                                    "tile_rows", "precs", "tile_budget",
                                    "form", "softmax_group",
                                    "apply_block", "score_block", "ablate"))
def fused_gab(x: jnp.ndarray, params: Dict, state: Dict,
              sym_idx: tuple, con_idx: tuple, *,
              interpret: bool = False, tile_rows: int = 0,
              precs: tuple = (), tile_budget: int = 2**12,
              form: str = "v1", softmax_group: int = 1,
              apply_block: bool = False,
              score_block: bool = False, ablate: str = "") -> jnp.ndarray:
    """x: (B, T, J, C) -> (B, T, J, 2C); eval-mode graph_attention_block.

    ``params``/``state``: the GAB subtree ({"local", "global", "cat_w",
    "cat_bn"}). ``sym_idx``/``con_idx``: flat row-major nonzero indices of
    the sym/con adjacencies as tuples (jit-static; from GraphStatics).
    Requires C <= MAX_FUSED_CHANNELS (all weights stay VMEM-resident
    alongside the activation tiles); use :func:`fused_gab_split` above that.

    ``precs``: static ((op_class, tier), ...) pairs over KERNEL_OPS setting
    each in-kernel matmul's precision (see gastx/ops/pallas/precision.py —
    Mosaic rejects the ambient HIGH tier, so precision must be explicit);
    unlisted ops inherit the ambient default_matmul_precision.
    """
    b_, t_, j_, c_ = x.shape
    _check_ablate(ablate)
    if c_ > MAX_FUSED_CHANNELS:
        raise ValueError(
            f"fused_gab supports C <= {MAX_FUSED_CHANNELS}, got {c_}")
    params, state = _ensure_f32(params), _ensure_f32(state)
    lp, gp = params["local"], params["global"]
    k, _, inter = gp["theta_w"].shape
    g_ch = gp["g_w"].shape[2]
    tiers = tiers_from_pairs(precs, KERNEL_OPS)

    local_ins, local_aux = _local_ins_form(form, lp, state, sym_idx,
                                           con_idx, j_, c_)
    ins = local_ins + _global_ins_form(form, gp, state, j_, c_, k, inter,
                                       g_ch, score_block=score_block) \
        + _concat_ins(params, state, c_)

    # Tile budget 2**12 (32 rows at C=128, 16 at C=256): the kernel's
    # scoped-VMEM stack (padded softmax + branch temporaries) measures
    # 31.28M at 128 rows/C=128 vs the 16M limit — same failure mode as
    # head_attn's TM=128 OOM; ~2**12/C rows keeps the stack under ~8M.
    # ``tile_budget`` is the tuning knob (GastNetConfig.gab_tile_budget).
    xf, tm, m_total, pad = _tile_rows(x, tile_rows, tile_budget)
    vm = pltpu.VMEM

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=k, inter=inter, g_ch=g_ch,
                          j=j_, local_aux=local_aux, tiers=tiers,
                          interpret=interpret, form=form,
                          softmax_group=softmax_group,
                          apply_block=apply_block,
                          score_block=score_block, ablate=ablate),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], j_, 2 * c_),
                                       x.dtype),
        grid=(xf.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm)] + [spec for _, spec in ins],
        out_specs=pl.BlockSpec((tm, j_, 2 * c_), lambda i: (i, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, *[arr for arr, _ in ins])

    if pad:
        out = out[:m_total]
    return out.reshape(b_, t_, j_, 2 * c_)


# --------------------------------------------------------------------------
# Frame-packed ("P-pack") narrow-channel form: P = 128//C whole FRAMES of
# the flattened B*T frame axis ride the lane axis — x tiles are
# (TM, J, P*C) — with block-diagonal weights, so a C=32 level runs 4
# frames per MXU pass instead of padding lanes 4x, and every per-op
# dispatch (the perf_lab20/26 bound) amortizes over P frames. The graph
# block is per-frame, so ANY P frames can share a lane group (B=2 TTA
# lifting packs as well as B=1024 training windows). Unlike the
# joint-packed layout (fused_gab_packed below), packed frames never
# interact, so the kernel needs NO lane->sublane unpack — the existing
# kernel bodies run unchanged with c'=P*C, K'=P*K: every dot's weight is
# block-diagonal over frames (built host-side), every per-channel table
# tiles P times along lanes, and the softmax/score chains see P*K
# "effective heads". Per-frame products are identical; only the MXU
# accumulation tree regroups around the exact-zero off-frame slots, so
# outputs agree with the classic kernel to ~ulp, not bitwise (same class
# of divergence as gab_score_block).
# --------------------------------------------------------------------------


def _pbatch_tree(params: Dict, state: Dict, p: int):
    """GAB param/state subtrees -> their P-sample batch-packed equivalents.

    Packed lane index = sample*C + channel (p-major); packed effective-head
    index = sample*K + head. Consumed by the unchanged _local_ins /
    _global_ins / _concat_ins packers, which then emit block-diagonal /
    lane-tiled VMEM tables.
    """
    lp, gp = params["local"], params["global"]

    def eye(dtype):
        return jnp.eye(p, dtype=dtype)

    def blkdiag(w):  # (Cin, Cout) -> (P*Cin, P*Cout)
        return jnp.kron(eye(w.dtype), w)

    def pieces(w, n):  # stacked (n*C, W) pieces -> (n*P*C, P*W) blockdiags
        rows = w.shape[0] // n
        return jnp.concatenate(
            [blkdiag(w[i * rows:(i + 1) * rows]) for i in range(n)], axis=0)

    def heads_diag(w):  # (K, C, W) -> (P*K, P*C, W), sample-offset inputs
        k, c_in, width = w.shape
        out = jnp.zeros((p, k, p * c_in, width), w.dtype)
        for pi in range(p):
            out = out.at[pi, :, pi * c_in:(pi + 1) * c_in, :].set(w)
        return out.reshape(p * k, p * c_in, width)

    def sem(d):
        return {"W0": blkdiag(d["W0"]), "W1": blkdiag(d["W1"]),
                "e": jnp.tile(d["e"], (p, 1))}

    def tile1(d):  # per-channel vectors (BN params/state)
        return {kk: jnp.tile(v, p) for kk, v in d.items()}

    k, _, g_ch = gp["g_w"].shape
    c_g = gp["cat_w"].shape[1]
    gcat = gp["cat_w"].reshape(k, g_ch, c_g)
    gcat_p = jnp.zeros((p, k, g_ch, p * c_g), gcat.dtype)
    for pi in range(p):
        gcat_p = gcat_p.at[pi, :, :, pi * c_g:(pi + 1) * c_g].set(gcat)

    pp = {
        "local": {
            "sym": sem(lp["sym"]), "con": sem(lp["con"]),
            "bn_sym": tile1(lp["bn_sym"]), "bn_con": tile1(lp["bn_con"]),
            "cat_w": pieces(lp["cat_w"], 2),
            "cat_bn": tile1(lp["cat_bn"]),
        },
        "global": {
            "theta_w": heads_diag(gp["theta_w"]),
            "phi_w": heads_diag(gp["phi_w"]),
            "g_w": heads_diag(gp["g_w"]),
            "theta_b": jnp.tile(gp["theta_b"], (p, 1)),
            "phi_b": jnp.tile(gp["phi_b"], (p, 1)),
            "g_b": jnp.tile(gp["g_b"], (p, 1)),
            "proj_theta": jnp.tile(gp["proj_theta"], (p, 1)),
            "proj_phi": jnp.tile(gp["proj_phi"], (p, 1)),
            "C_k": jnp.tile(gp["C_k"], (p, 1, 1)),
            "cat_w": gcat_p.reshape(p * k * g_ch, p * c_g),
            "cat_bn": tile1(gp["cat_bn"]),
        },
        "cat_w": pieces(params["cat_w"], 3),
        "cat_bn": tile1(params["cat_bn"]),
    }
    ps = jax.tree_util.tree_map(lambda v: jnp.tile(v, p), state)
    return pp, ps


@functools.partial(jax.jit,
                   static_argnames=("sym_idx", "con_idx", "pack",
                                    "interpret", "tile_rows", "precs",
                                    "tile_budget", "form", "softmax_group",
                                    "apply_block", "score_block", "ablate"))
def fused_gab_pbatch(x: jnp.ndarray, params: Dict, state: Dict,
                     sym_idx: tuple, con_idx: tuple, *, pack: int,
                     interpret: bool = False, tile_rows: int = 0,
                     precs: tuple = (), tile_budget: int = 2**12,
                     form: str = "v1", softmax_group: int = 1,
                     apply_block: bool = False,
                     score_block: bool = False,
                     ablate: str = "") -> jnp.ndarray:
    """Frame-packed whole-block kernel: (B, T, J, C) -> (B, T, J, 2C) with
    ``pack`` FRAMES per lane group (pack*C <= MAX_FUSED_CHANNELS).

    The graph block is per-frame (attention and the graph convs act within
    one frame's J joints), so any ``pack`` frames of the flattened B*T
    frame axis can share a lane group — whole-sequence lifting at B=2 TTA
    pairs packs as well as B=1024 training windows, with at most pack-1
    zero frames of padding. Same contract as :func:`fused_gab` (classic
    layout in and out — the pack/unpack transposes run in XLA around the
    kernel and touch only the narrow C-wide tensors); v1/fold forms.
    """
    b0, t_, j_, c_ = x.shape
    _check_ablate(ablate)
    if pack <= 1:
        return fused_gab(x, params, state, sym_idx, con_idx,
                         interpret=interpret, tile_rows=tile_rows,
                         precs=precs, tile_budget=tile_budget, form=form,
                         softmax_group=softmax_group,
                         apply_block=apply_block, score_block=score_block,
                         ablate=ablate)
    if pack * c_ > MAX_FUSED_CHANNELS:
        raise ValueError(
            f"fused_gab_pbatch: pack*C = {pack * c_} exceeds "
            f"{MAX_FUSED_CHANNELS}")
    params, state = _ensure_f32(params), _ensure_f32(state)
    m0 = b0 * t_
    xf = x.reshape(m0, j_, c_)
    pad_m = (-m0) % pack
    if pad_m:
        xf = jnp.concatenate(
            [xf, jnp.zeros((pad_m, j_, c_), x.dtype)], axis=0)
    g = xf.shape[0] // pack
    xp = xf.reshape(g, pack, j_, c_).transpose(0, 2, 1, 3) \
        .reshape(g, 1, j_, pack * c_)
    pp, ps = _pbatch_tree(params, state, pack)
    # Scoped-VMEM stack scales with rows x effective heads (P*K score
    # slivers per row tile): at P*K = 16 the default 4096 budget's TM=32
    # tile overflows the 16M limit (remote-compile HTTP 500, r4 bisect) —
    # TM=16 compiles and runs. Scale the budget by 8/K' beyond 8 heads.
    k_eff = pack * params["global"]["theta_w"].shape[0]
    budget = tile_budget * 8 // max(8, k_eff)
    yp = fused_gab(xp, pp, ps, sym_idx, con_idx, interpret=interpret,
                   tile_rows=tile_rows, precs=precs,
                   tile_budget=budget, form=form,
                   softmax_group=softmax_group, apply_block=apply_block,
                   score_block=score_block, ablate=ablate)
    y = yp.reshape(g, j_, pack, 2 * c_).transpose(0, 2, 1, 3) \
        .reshape(g * pack, j_, 2 * c_)
    return y[:m0].reshape(b0, t_, j_, 2 * c_)


def _kernel_packed(x_ref, *refs, num_heads: int, inter: int, g_ch: int,
                   j: int, local_aux, tiers, interpret: bool, form: str,
                   softmax_group: int = 1, apply_block: bool = False,
                   score_block: bool = False):
    """Whole-block kernel on the PACKED (TM, J*C) layout.

    Identical math to :func:`_kernel`; only the HBM tile shapes differ —
    the packed layout stores narrow-channel activations with J*C on the
    lane axis (544 vs 32->128 padding for the 243f ch-32 levels, a 5.65x
    HBM traffic cut), and the (TM, J*C) -> (TM*J, C) unpack happens here
    in VMEM where the shuffle is ~free.
    """
    out_ref = refs[-1]
    nl = _LOCAL_NREFS[form]
    lrefs = refs[:nl]
    grefs = refs[nl:nl + _GLOBAL_NREFS[form]]
    crefs = refs[nl + _GLOBAL_NREFS[form]:-1]
    tm = x_ref.shape[0]
    c = x_ref.shape[1] // j
    xr = x_ref[:].reshape(tm * j, c)
    dot, dotg = _make_dots(tiers, interpret)

    local = _run_local(form, xr, tm, j, c, dot, lrefs, local_aux)
    globl = _run_global(form, xr, tm, j, c, dot, dotg, grefs,
                        num_heads, inter, g_ch, softmax_group,
                        apply_block, score_block)
    y = _block_concat(xr, local, globl, c, dot, *crefs)
    out_ref[:] = y.reshape(tm, j * 2 * c)


@functools.partial(jax.jit,
                   static_argnames=("num_joints", "sym_idx", "con_idx",
                                    "interpret", "tile_rows", "precs",
                                    "tile_budget", "form", "softmax_group",
                                    "apply_block", "score_block"))
def fused_gab_packed(x: jnp.ndarray, params: Dict, state: Dict,
                     num_joints: int, sym_idx: tuple, con_idx: tuple, *,
                     interpret: bool = False, tile_rows: int = 0,
                     precs: tuple = (), tile_budget: int = 2**12,
                     form: str = "v1", softmax_group: int = 1,
                     apply_block: bool = False,
                     score_block: bool = False) -> jnp.ndarray:
    """Packed-layout whole-block kernel: (B, T, J*C) -> (B, T, J*2C).

    Same contract as :func:`fused_gab` but for activations kept in the
    packed narrow-level layout (gastx/models/gastnet.py packed path):
    HBM tiles are 2-D (rows, J*C), so a C=32 level moves 1.18x-padded
    bytes instead of 5.65x.
    """
    b_, t_, jc = x.shape
    j_ = num_joints
    c_ = jc // j_
    assert c_ * j_ == jc, (jc, j_)
    if c_ > MAX_FUSED_CHANNELS:
        raise ValueError(
            f"fused_gab_packed supports C <= {MAX_FUSED_CHANNELS}, got {c_}")
    lp, gp = params["local"], params["global"]
    k, _, inter = gp["theta_w"].shape
    g_ch = gp["g_w"].shape[2]
    tiers = tiers_from_pairs(precs, KERNEL_OPS)

    local_ins, local_aux = _local_ins_form(form, lp, state, sym_idx,
                                           con_idx, j_, c_)
    ins = local_ins + _global_ins_form(form, gp, state, j_, c_, k, inter,
                                       g_ch, score_block=score_block) \
        + _concat_ins(params, state, c_)

    m_total = b_ * t_
    tm = tile_rows or max(8, min(128, tile_budget // max(c_, 128)))
    pad = (-m_total) % tm
    xf = x.reshape(m_total, jc)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, jc), x.dtype)], axis=0)
    vm = pltpu.VMEM

    out = pl.pallas_call(
        functools.partial(_kernel_packed, num_heads=k, inter=inter,
                          g_ch=g_ch, j=j_, local_aux=local_aux,
                          tiers=tiers, interpret=interpret, form=form,
                          softmax_group=softmax_group,
                          apply_block=apply_block,
                          score_block=score_block),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], j_ * 2 * c_),
                                       jnp.float32),
        grid=(xf.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, jc), lambda i: (i, 0),
                               memory_space=vm)] + [spec for _, spec in ins],
        out_specs=pl.BlockSpec((tm, j_ * 2 * c_), lambda i: (i, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, *[arr for arr, _ in ins])

    if pad:
        out = out[:m_total]
    return out.reshape(b_, t_, j_ * 2 * c_)


@functools.partial(jax.jit,
                   static_argnames=("sym_idx", "con_idx", "interpret",
                                    "tile_rows", "precs", "form"))
def fused_local_branch(x: jnp.ndarray, params: Dict, state: Dict,
                       sym_idx: tuple, con_idx: tuple, *,
                       interpret: bool = False, tile_rows: int = 0,
                       precs: tuple = (), form: str = "v1") -> jnp.ndarray:
    """x: (B, T, J, C) -> (B, T, J, C); eval-mode LOCAL branch only.

    The standalone local-branch kernel of :func:`fused_gab_split` — the
    sym/con semantic graph convs + BN/ReLU + 2C->C concat matmul + BN/ReLU
    (reference model/local_attention.py:59-151) fused into one VMEM pass:
    x is read once, only the (M, J, C) local tensor is written back, and
    the masked-softmax aggregation is dot-free FMAs. Under the mixed
    inference preset its matmuls are 6 single-pass dots — inside this
    host's remote-Mosaic dot-count compile budget (r2 bisection: 3 dots
    compile, ~15 SIGKILL), unlike the whole-block kernels. Used by the
    ``gab_impl="pallas_local"`` hybrid wiring (global branch + block
    concat stay on the XLA path).

    ``params``/``state``: the full GAB subtree (same contract as
    :func:`fused_gab`; only the "local" entries are consumed).
    """
    b_, t_, j_, c_ = x.shape
    if c_ > MAX_SPLIT_CHANNELS:
        raise ValueError(
            f"fused_local_branch supports C <= {MAX_SPLIT_CHANNELS}, "
            f"got {c_}")
    params, state = _ensure_f32(params), _ensure_f32(state)
    lp = params["local"]
    tiers = tiers_from_pairs(precs, KERNEL_OPS)
    local_ins, local_aux = _local_ins_form(form, lp, state, sym_idx,
                                           con_idx, j_, c_)

    xf, tm, m_total, pad = _tile_rows(x, tile_rows, 2**13)
    vm = pltpu.VMEM

    local = pl.pallas_call(
        functools.partial(_kernel_local, j=j_, local_aux=local_aux,
                          tiers=tiers, interpret=interpret, form=form),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], j_, c_), x.dtype),
        grid=(xf.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [spec for _, spec in local_ins],
        out_specs=pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, *[arr for arr, _ in local_ins])

    if pad:
        local = local[:m_total]
    return local.reshape(b_, t_, j_, c_)


@functools.partial(jax.jit,
                   static_argnames=("sym_idx", "con_idx", "interpret",
                                    "tile_rows", "precs", "tile_budget",
                                    "form", "softmax_group",
                                    "apply_block", "score_block"))
def fused_gab_split(x: jnp.ndarray, params: Dict, state: Dict,
                    sym_idx: tuple, con_idx: tuple, *,
                    interpret: bool = False, tile_rows: int = 0,
                    precs: tuple = (), tile_budget: int = 2**12,
                    form: str = "v1", softmax_group: int = 1,
                    apply_block: bool = False,
                    score_block: bool = False) -> jnp.ndarray:
    """Same contract as :func:`fused_gab`, for MAX_FUSED_CHANNELS < C <=
    MAX_SPLIT_CHANNELS (the C=512 widest level of every shipped config).

    Two pallas_calls: the local-branch kernel (sym/con convs + 2C->C cat,
    ~6.3 MB of weights at C=512) writes the (M, J, C) local tensor to HBM
    once; the global+concat kernel (~10.4 MB of weights) re-reads x and
    local and writes the (M, J, 2C) block output.
    """
    b_, t_, j_, c_ = x.shape
    if c_ > MAX_SPLIT_CHANNELS:
        raise ValueError(
            f"fused_gab_split supports C <= {MAX_SPLIT_CHANNELS}, got {c_}")
    params, state = _ensure_f32(params), _ensure_f32(state)
    lp, gp = params["local"], params["global"]
    k, _, inter = gp["theta_w"].shape
    g_ch = gp["g_w"].shape[2]
    tiers = tiers_from_pairs(precs, KERNEL_OPS)

    local_ins, local_aux = _local_ins_form(form, lp, state, sym_idx,
                                           con_idx, j_, c_)
    glob_ins = _global_ins_form(form, gp, state, j_, c_, k, inter, g_ch,
                                score_block=score_block) \
        + _concat_ins(params, state, c_)

    # Small row tiles (8 at C=512): the global+concat kernel holds
    # ~10.4 MB of weights at C=512 AND its scoped-VMEM temporary stack
    # scales with rows x C (see fused_gab's 2**12 budget note).
    xf, tm, m_total, pad = _tile_rows(x, tile_rows, tile_budget)
    vm = pltpu.VMEM

    local = pl.pallas_call(
        functools.partial(_kernel_local, j=j_, local_aux=local_aux,
                          tiers=tiers, interpret=interpret, form=form),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], j_, c_), x.dtype),
        grid=(xf.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [spec for _, spec in local_ins],
        out_specs=pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, *[arr for arr, _ in local_ins])

    out = pl.pallas_call(
        functools.partial(_kernel_globcat, num_heads=k, inter=inter,
                          g_ch=g_ch, j=j_, tiers=tiers, interpret=interpret,
                          form=form, softmax_group=softmax_group,
                          apply_block=apply_block,
                          score_block=score_block),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], j_, 2 * c_),
                                       x.dtype),
        grid=(xf.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm),
                  pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [spec for _, spec in glob_ins],
        out_specs=pl.BlockSpec((tm, j_, 2 * c_), lambda i: (i, 0, 0),
                               memory_space=vm),
        interpret=interpret,
    )(xf, local, *[arr for arr, _ in glob_ins])

    if pad:
        out = out[:m_total]
    return out.reshape(b_, t_, j_, 2 * c_)
