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

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gastx.ops.batchnorm import batch_norm

# Matches the reference's masked-softmax fill value exactly
# (model/local_attention.py:40); intentionally not -inf for fp32 parity.
_MASK_FILL = -9e15

# Per-op-class precision resolver: maps an op-class name (e.g. "attn_proj")
# to a jax matmul precision string, or None to inherit the enclosing
# jax.default_matmul_precision context.
PrecFn = Callable[[str], Optional[str]]


def _no_override(_op: str) -> Optional[str]:
    return None


@functools.lru_cache(maxsize=None)
def _local_gather_tables(mask_idx: Tuple[int, ...], j: int):
    """Static padded-degree neighbor tables for the gather-based graph conv.

    From the flat row-major nonzero indices of a (J, J) adjacency, build
    (J, D) tables where D is the max row degree: ``slot`` indexes into the
    nnz axis of the edge-logit tensor (pad -> a -inf extra slot), ``col`` is
    the neighbor joint index, ``is_diag`` marks the self-loop entry.
    """
    idx = np.asarray(mask_idx, np.int64)
    rows, cols = idx // j, idx % j
    per_row = [np.flatnonzero(rows == r) for r in range(j)]
    d = max(len(p) for p in per_row)
    nnz = len(idx)
    slot = np.full((j, d), nnz, np.int32)        # pad slot = extra -inf row
    col = np.zeros((j, d), np.int32)
    valid = np.zeros((j, d), bool)
    for r, p in enumerate(per_row):
        slot[r, : len(p)] = p
        col[r, : len(p)] = cols[p]
        valid[r, : len(p)] = True
    is_diag = valid & (col == np.arange(j)[:, None])
    return slot, col, valid, is_diag


def sem_ch_graph_conv(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    mask_idx: np.ndarray,
    num_joints: int,
    *,
    impl: str = "einsum",
    prec: PrecFn = _no_override,
) -> jnp.ndarray:
    """Channel-wise semantic graph conv.

    ``x``: (B, T, J, Cin). ``params``: W0/W1 (Cin, Cout) self/neighbor weight
    matrices, e (Cout, nnz) learnable edge logits, optional bias (Cout,).
    ``mask_idx``: static flat row-major indices of adjacency nonzeros (the
    ordering matches ``torch.nonzero`` so imported ``e`` tensors line up).

    ``impl="einsum"`` materializes the per-channel (C, J, J) adjacency and
    contracts it with a channel-batched einsum. ``impl="gather"`` exploits
    that the masked-softmax rows are sparse (row degree <= ~5): it softmaxes
    only the nonzero segments (bit-identical — the -9e15 fills underflow to
    exact zeros) and aggregates neighbors with a static padded-degree gather,
    avoiding the channel-major transposes of the batched matmul. Both are
    numerically equivalent to the reference model/local_attention.py:35-53.
    """
    w0, w1, e = params["W0"], params["W1"], params["e"]
    c_out = w0.shape[1]
    j = num_joints

    h0 = jnp.matmul(x, w0, precision=prec("local_sem"))
    h1 = jnp.matmul(x, w1, precision=prec("local_sem"))

    if impl == "gather":
        slot, col, valid, is_diag = _local_gather_tables(
            tuple(int(i) for i in np.asarray(mask_idx)), j)
        e_t = jnp.concatenate(
            [e.T.astype(x.dtype),
             jnp.full((1, c_out), -jnp.inf, x.dtype)], axis=0)  # (nnz+1, C)
        logits = e_t[slot]                                      # (J, D, C)
        w = jax.nn.softmax(logits, axis=1)
        w_self = jnp.sum(jnp.where(is_diag[..., None], w, 0.0), axis=1)
        w_nbr = jnp.where((valid & ~is_diag)[..., None], w, 0.0)
        gathered = h1[:, :, col, :]                     # (B, T, J, D, C)
        out = h0 * w_self + jnp.sum(gathered * w_nbr, axis=-2)
    else:
        logits = jnp.full((c_out, j * j), _MASK_FILL, dtype=x.dtype)
        logits = logits.at[:, mask_idx].set(e.astype(x.dtype))
        adj = jax.nn.softmax(logits.reshape(c_out, j, j), axis=2)

        diag = jnp.diagonal(adj, axis1=1, axis2=2)          # (C, J)
        off = adj * (1.0 - jnp.eye(j, dtype=x.dtype))       # (C, J, J)

        out = h0 * diag.T + jnp.einsum("cjk,btkc->btjc", off, h1,
                                       precision=prec("local_off"))
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
    impl: str = "einsum",
    prec: PrecFn = _no_override,
) -> Tuple[jnp.ndarray, Dict]:
    """Two-branch (mirror-symmetry + kinematic-connection) local module."""
    j = statics.num_joints
    a = sem_ch_graph_conv(x, params["sym"], statics.sym_idx, j,
                          impl=impl, prec=prec)
    b = sem_ch_graph_conv(x, params["con"], statics.con_idx, j,
                          impl=impl, prec=prec)

    a, s_bn1 = batch_norm(a, params["bn_sym"], state["bn_sym"], train=train)
    b, s_bn2 = batch_norm(b, params["bn_con"], state["bn_con"], train=train)
    a = jax.nn.relu(a)
    b = jax.nn.relu(b)

    y = jnp.matmul(jnp.concatenate([a, b], axis=-1), params["cat_w"],
                   precision=prec("local_cat"))
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
    impl: str = "einsum",
    prec: PrecFn = _no_override,
) -> Tuple[jnp.ndarray, Dict]:
    """Multi-head non-local attention over joints, all heads batched.

    Stacked parameters: theta_w/phi_w (K, C, I), g_w (K, C, G), biases
    (K, I)/(K, G), proj_theta/proj_phi (K, I) — the split halves of the
    reference's ``concat_project`` 1x1-conv weight — and C_k (K, J, J)
    learnable attention biases.

    Shared layout strategy: activations stay flat (B*T*J, C) channels-last
    through the three projections and the output matmul — no (b, k, j, i)
    intermediates to transpose — and the per-head rank-1 scores come from
    block-diagonal projection matrices so they are plain matmuls too.

    The two impls differ in how the attention tensor is laid out:

    * ``impl="einsum"`` builds one 4-D (M, Jq, Jm, K) score tensor and
      applies it with a (m, k)-batched einsum. The K=4 lane axis pads to
      128 on TPU, so this tensor costs ~32x its logical HBM footprint and
      the einsum forces (m,k)-batched relayouts.
    * ``impl="batched"`` unrolls the K heads (trace-time loop): per head the
      scores are a 3-D (M, Jq, Jm) tensor — Jm lives in lanes, softmax is a
      lane reduction — and the application is a single M-batched
      (Jq,Jm)@(Jm,G) dot_general. ~4x less padded attention traffic.
    * ``impl="pallas_head"`` (eval only; "+_interpret" for CPU) keeps the
      projections and output matmul in XLA but runs each head's
      score/softmax/apply chain in the single-head Pallas kernel
      (gastx/ops/pallas/head_attn.py), so the padding-hostile (M, Jq, Jm)
      score tensors never touch HBM. One kernel compile, K invocations —
      sized for this host's dot-count-limited remote Mosaic compiler.
    """
    b_, t_, j_, c_ = x.shape
    k, _, i = params["theta_w"].shape
    g_ch = params["g_w"].shape[2]
    m = b_ * t_
    xf = x.reshape(m * j_, c_)
    if impl.startswith("pallas_head") and train:
        impl = "batched"  # kernel has no vjp; train uses the XLA path

    def cols(w, width):  # (K, C, width) -> (C, K*width), head-major columns
        return jnp.transpose(w, (1, 0, 2)).reshape(c_, k * width)

    theta = jnp.matmul(xf, cols(params["theta_w"], i),
                       precision=prec("attn_proj")) + \
        params["theta_b"].reshape(k * i)
    phi = jnp.matmul(xf, cols(params["phi_w"], i),
                     precision=prec("attn_proj")) + \
        params["phi_b"].reshape(k * i)
    gx = jnp.matmul(xf, cols(params["g_w"], g_ch),
                    precision=prec("attn_proj")) + \
        params["g_b"].reshape(k * g_ch)

    if impl.startswith("pallas_head"):
        from gastx.ops.pallas.head_attn import head_attention
        from gastx.ops.pallas.precision import resolve_tiers

        # Resolve the model's attn_score/attn_apply tiers into the kernel
        # (Mosaic needs explicit per-dot precision; hardcoding "default"
        # would silently break non-mixed configs' precision contract).
        tiers = dict(resolve_tiers(prec, ("attn_score", "attn_apply")))
        t3 = theta.reshape(m, j_, k * i)
        p3 = phi.reshape(m, j_, k * i)
        g3 = gx.reshape(m, j_, k * g_ch)
        outs = []
        for h in range(k):
            outs.append(head_attention(
                t3[:, :, h * i:(h + 1) * i], p3[:, :, h * i:(h + 1) * i],
                g3[:, :, h * g_ch:(h + 1) * g_ch],
                params["proj_theta"][h].reshape(i, 1),
                params["proj_phi"][h].reshape(i, 1),
                params["C_k"][h],
                score_tier=tiers["attn_score"],
                apply_tier=tiers["attn_apply"],
                interpret=impl.endswith("_interpret")))
        y = jnp.concatenate(outs, axis=2).reshape(b_, t_, j_, k * g_ch)
        y = jnp.matmul(y, params["cat_w"], precision=prec("attn_cat"))
        y, s_cat = batch_norm(y, params["cat_bn"], state["cat_bn"],
                              train=train)
        y = jax.nn.relu(y)
        return y, {"cat_bn": s_cat}

    # Pairwise score decomposed from concat_project: f[q, m] = a[q] + b[m],
    # per head via block-diagonal (K*I, K) projections.
    rows = np.arange(k * i)
    blocks = np.repeat(np.arange(k), i)
    p_t = jnp.zeros((k * i, k), x.dtype).at[rows, blocks].set(
        params["proj_theta"].reshape(-1))
    p_p = jnp.zeros((k * i, k), x.dtype).at[rows, blocks].set(
        params["proj_phi"].reshape(-1))
    a = jnp.matmul(theta, p_t, precision=prec("attn_score"))
    b = jnp.matmul(phi, p_p, precision=prec("attn_score"))

    if impl == "batched":
        a3 = a.reshape(m, j_, k)
        b3 = b.reshape(m, j_, k)
        apply_prec = prec("attn_apply")
        outs = []
        for h in range(k):
            f = jax.nn.leaky_relu(
                a3[:, :, h:h + 1] + b3[:, :, h][:, None, :],
                negative_slope=0.2)                      # (M, Jq, Jm)
            attn = jax.nn.softmax(f, axis=2) + params["C_k"][h]
            gx_h = gx[:, h * g_ch:(h + 1) * g_ch].reshape(m, j_, g_ch)
            outs.append(jax.lax.dot_general(
                attn, gx_h, (((2,), (1,)), ((0,), (0,))),
                precision=apply_prec))                   # (M, Jq, G)
        # Head-major concat matches the reference's torch.cat over head
        # outputs (global_attention.py:111).
        y = jnp.concatenate(outs, axis=2).reshape(b_, t_, j_, k * g_ch)
    else:
        f = jax.nn.leaky_relu(a.reshape(m, j_, 1, k) + b.reshape(m, 1, j_, k),
                              negative_slope=0.2)
        attn = jax.nn.softmax(f, axis=2)
        attn = attn + jnp.transpose(params["C_k"], (1, 2, 0))  # (Jq, Jm, K)

        gx4 = gx.reshape(m, j_, k, g_ch)
        y = jnp.einsum("mqnk,mnkg->mqkg", attn, gx4,
                       precision=prec("attn_apply"))
        y = y.reshape(b_, t_, j_, k * g_ch)

    y = jnp.matmul(y, params["cat_w"], precision=prec("attn_cat"))
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
    attn_impl: str = "einsum",
    local_impl: str = "einsum",
    gab_impl: str = "xla",
    gab_tile_budget: int = 4096,
    gab_io_dtype: str = "float32",
    gab_kernel_form: str = "v1",
    gab_softmax_group: int = 1,
    gab_apply_block: bool = False,
    gab_score_block: bool = False,
    gab_pbatch_max_pack: int = 0,
    prec: PrecFn = _no_override,
) -> Tuple[jnp.ndarray, Dict]:
    """residual ++ local ++ global -> 1x1 conv (3C->2C) -> BN -> ReLU.

    Reference: model/gast_net.py:8-33. This is where channels double.

    ``gab_impl="pallas"`` routes the eval-mode block through the fused
    VMEM kernels (gastx/ops/pallas/fused_gab.py): the whole-block kernel
    up to C=256, the two-kernel split form up to C=512 (the widest level
    of every shipped config); training falls back to the XLA path below.

    ``gab_impl="pallas_local"`` is the hybrid form: only the local branch
    runs as a fused kernel; the global branch and the 3C->2C block concat
    stay on the XLA path (measured a tie vs "xla" on-chip, r3).

    ``gab_impl="auto"`` resolves to "pallas" on a TPU backend and "xla"
    elsewhere (the kernels have no CPU lowering outside interpret mode) —
    the production inference default: measured +14% end-to-end
    (14,074 vs 12,299 seq/s) at 0.0631mm worst of 24 seeds under the
    r3c-certified preset (DESIGN.md).
    """
    if gab_impl == "auto":
        # Measured routing. f32 activations: fused kernels (+8% at 27f,
        # perf_lab7; the r3d batched-softmax/2-pass adoptions widened it).
        # bf16-storage activations (r3 said XLA, perf_lab11): REVERSED r4
        # after the adoptions lab11 predated — the kernels now win at
        # every level, with the frame-packed form on narrow (C < 128)
        # levels (perf_lab28/29: 243f 1,110 -> 1,259 seq/s, 81f 4,313 ->
        # 4,775 under this exact routing).
        if jax.default_backend() != "tpu":
            gab_impl = "xla"
        elif x.dtype == jnp.float32:
            gab_impl = "pallas"
        else:
            gab_impl = ("pallas_pbatch" if x.shape[-1] < 128 else "pallas")
    if gab_impl.startswith("pallas_local") and x.dtype != jnp.float32:
        # The hybrid mixes kernel outputs with XLA activations, so its
        # dtypes must match; bf16 storage takes the XLA path here.
        gab_impl = "xla"
    if gab_impl.startswith("pallas_pbatch") and not train:
        # Batch-packed narrow-channel form: P = 128//C samples ride the
        # lane axis with block-diagonal weights (fused_gab_pbatch) — the
        # r4 attack on the 243f/81f C=32/64 lane-padding + per-op-dispatch
        # bound (perf_lab26 attribution). P = 1 (C >= 128) degrades to the
        # plain whole-block/split routing below.
        from gastx.ops.pallas.fused_gab import (
            KERNEL_OPS, MAX_FUSED_CHANNELS, fused_gab_pbatch)
        from gastx.ops.pallas.precision import resolve_tiers

        pack = max(1, min(128 // x.shape[-1],
                          MAX_FUSED_CHANNELS // x.shape[-1]))
        if gab_pbatch_max_pack:
            pack = min(pack, gab_pbatch_max_pack)
        if pack > 1:
            y = fused_gab_pbatch(
                x, params, state,
                tuple(int(i) for i in statics.sym_idx),
                tuple(int(i) for i in statics.con_idx),
                pack=pack, interpret=gab_impl.endswith("_interpret"),
                precs=resolve_tiers(prec, KERNEL_OPS),
                tile_budget=gab_tile_budget, form=gab_kernel_form,
                softmax_group=gab_softmax_group,
                apply_block=gab_apply_block, score_block=gab_score_block)
            return y, state
        gab_impl = ("pallas_interpret" if gab_impl.endswith("_interpret")
                    else "pallas")
    use_local_kernel = False
    if gab_impl.startswith("pallas_local") and not train:
        from gastx.ops.pallas.fused_gab import MAX_SPLIT_CHANNELS

        # Hybrid: only the local branch runs fused; the global branch and
        # block concat fall through to the shared XLA tail below.
        use_local_kernel = x.shape[-1] <= MAX_SPLIT_CHANNELS
    elif gab_impl != "xla" and not train:
        from gastx.ops.pallas.fused_gab import (
            KERNEL_OPS, MAX_FUSED_CHANNELS, MAX_SPLIT_CHANNELS, fused_gab,
            fused_gab_split)
        from gastx.ops.pallas.precision import resolve_tiers

        if x.shape[-1] <= MAX_SPLIT_CHANNELS:
            # Whole-block kernel while all weights fit VMEM; the two-kernel
            # split form for the C=512 widest level. Eval-mode BN leaves
            # state untouched, so both return the input state subtree.
            fn = (fused_gab if x.shape[-1] <= MAX_FUSED_CHANNELS
                  else fused_gab_split)
            restore_f32 = False
            if gab_io_dtype == "bfloat16" and x.dtype == jnp.float32:
                # Boundary-only bf16: the downcast fuses into the producing
                # XLA fusion, the kernel reads/writes bf16 HBM but still
                # computes in f32 (upcast on VMEM load), and the upcast
                # back below fuses into the consuming conv's fusion — so
                # HBM traffic at the block boundary halves while only the
                # activation values crossing it are rounded, unlike full
                # bf16 storage_dtype (GastNetConfig.gab_io_dtype). The
                # op-graph dtype contract stays f32 for every caller
                # (lax convs reject mixed-dtype operands).
                x = x.astype(jnp.bfloat16)
                restore_f32 = True
            y = fn(x, params, state,
                   tuple(int(i) for i in statics.sym_idx),
                   tuple(int(i) for i in statics.con_idx),
                   interpret=gab_impl.endswith("_interpret"),
                   precs=resolve_tiers(prec, KERNEL_OPS),
                   tile_budget=gab_tile_budget, form=gab_kernel_form,
                   softmax_group=gab_softmax_group,
                   apply_block=gab_apply_block,
                   score_block=gab_score_block)
            if restore_f32:
                y = y.astype(jnp.float32)
            return y, state

    rng_l = rng_g = None
    if rng is not None:
        rng_l, rng_g = jax.random.split(rng)

    if use_local_kernel:
        from gastx.ops.pallas.fused_gab import KERNEL_OPS, fused_local_branch
        from gastx.ops.pallas.precision import resolve_tiers

        local = fused_local_branch(
            x, params, state,
            tuple(int(i) for i in statics.sym_idx),
            tuple(int(i) for i in statics.con_idx),
            interpret=gab_impl.endswith("_interpret"),
            precs=resolve_tiers(prec, KERNEL_OPS),
            form=gab_kernel_form)
        s_local = state["local"]  # eval mode: BN state untouched
    else:
        local, s_local = local_graph(
            x, params["local"], state["local"], statics,
            train=train, dropout_rate=dropout_rate, rng=rng_l,
            impl=local_impl, prec=prec)
    globl, s_glob = multi_global_graph(
        x, params["global"], state["global"],
        train=train, dropout_rate=dropout_rate, rng=rng_g,
        impl=attn_impl, prec=prec)

    y = jnp.concatenate([x, local, globl], axis=-1)
    y = jnp.matmul(y, params["cat_w"], precision=prec("gab_cat"))
    y, s_cat = batch_norm(y, params["cat_bn"], state["cat_bn"], train=train)
    y = jax.nn.relu(y)

    return y, {"local": s_local, "global": s_glob, "cat_bn": s_cat}
