"""GastNet forward pass — graph-attention spatio-temporal lifting, TPU-native.

One parameterized forward covers the reference's two weight-compatible
variants (model/gast_net.py:107-251):

  * ``variant="dilated"`` — the reference SpatioTemporalModel: valid dilated
    temporal convs, used for all evaluation/inference, accepting any T >=
    receptive_field and emitting T - (rf-1) output frames.
  * ``variant="strided"`` — SpatioTemporalModelOptimized1f: strided temporal
    convs for stride-1 training chunks (input T == receptive_field, output 1
    frame) that skip computing unused intermediate frames. Parameter trees are
    identical, so weights are interchangeable, matching
    model/gast_net.py:186-188.

Activations are channels-last (B, T, J, C) throughout: channel contractions
land on the MXU lane dimension, graph ops batch over B*T, and XLA fuses the
BN/ReLU/residual chains into the convs. The Python level loop unrolls at trace
time (filter_widths is static).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gastx.models.config import GastNetConfig, graph_statics, xla_precision
from gastx.ops.batchnorm import batch_norm
from gastx.ops.graph import _dropout, graph_attention_block
from gastx.ops.temporal import pointwise, temporal_conv


def gastnet_forward(
    params: Dict,
    state: Dict,
    x: jnp.ndarray,
    cfg: GastNetConfig,
    *,
    variant: str = "dilated",
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Lift 2D keypoint sequences to 3D.

    ``x``: (B, T, J, C_in) normalized 2D keypoints. Returns
    ((B, T_out, J, 3) poses, new BN state). ``variant`` and ``train`` are
    static under jit; pass ``rng`` when ``train`` for dropout.
    """
    assert x.ndim == 4, x.shape
    assert x.shape[-2] == cfg.num_joints_in, (x.shape, cfg.num_joints_in)
    assert x.shape[-1] == cfg.in_features, (x.shape, cfg.in_features)
    assert variant in ("dilated", "strided")
    if train and cfg.dropout > 0.0:
        assert rng is not None, "rng required for dropout in train mode"

    # Eval-mode bf16 activation/param storage (cfg.storage_dtype; measured
    # per-architecture in scripts/perf_lab8.py — see the config table).
    # Training always stays f32; outputs and BN state stay f32 at the
    # boundary (eval mode never mutates state).
    sd = cfg.storage_dtype
    if sd == "auto":
        sd = ("bfloat16" if not train and jax.default_backend() == "tpu"
              else "float32")
    lds = tuple(cfg.storage_dtype_for(i, sd) for i in range(cfg.num_levels))
    if not train and any(d == "bfloat16" for d in lds):
        from gastx.models.precision import cast_floating

        orig_state = state
        if all(d == "bfloat16" for d in lds):
            # Uniform bf16: one global cast (the r3-measured program).
            params = cast_floating(params, jnp.bfloat16)
            state = cast_floating(state, jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
            with jax.default_matmul_precision(cfg.matmul_precision):
                y, _ = _forward(params, state, x, cfg, variant=variant,
                                train=False, rng=rng)
        else:
            # Mixed per-level storage (storage_dtype_levels): _forward
            # casts activations + each level's params at level entry.
            with jax.default_matmul_precision(cfg.matmul_precision):
                y, _ = _forward(
                    params, state, x, cfg, variant=variant, train=False,
                    rng=rng,
                    level_dtypes=tuple(
                        jnp.bfloat16 if d == "bfloat16" else jnp.float32
                        for d in lds))
        return y.astype(jnp.float32), orig_state

    with jax.default_matmul_precision(cfg.matmul_precision):
        return _forward(params, state, x, cfg, variant=variant, train=train,
                        rng=rng)


def _packed_prefix(params, state, y, cfg, statics, level_prec):
    """Eval-mode narrow-level prefix in the PACKED (B, T, J*C) layout.

    The 243f/81f architectures' narrow levels (C=32/64) pad the 128-lane
    dim 4x/2x in the standard (B, T, J, C) layout — the bandwidth ceiling
    perf_lab8 measured. Packing J into lanes stores them at J*C=544/1088
    (1.18x/1.0x padding). Per level: the temporal/1x1 convs become
    block-diagonal matmuls (kron(I_J, W) — ~J x more MXU FLOPs, which the
    memory-bound roofline makes free), BN runs with J-tiled vectors, and
    the graph block runs in the packed whole-block Pallas kernel
    (fused_gab_packed) which unpacks in VMEM. Returns
    (y unpacked (B,T,J,C), first classic level index, its dilation).
    Eval only — BN state is unchanged, dropout off.
    """
    from gastx.ops.pallas.fused_gab import KERNEL_OPS, fused_gab_packed
    from gastx.ops.pallas.precision import resolve_tiers

    interpret = cfg.gab_impl == "pallas_interpret"
    j = statics.num_joints
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    fw = cfg.filter_widths
    pads = cfg.pads()
    shifts = cfg.causal_shifts("dilated")

    def tiled(d):
        return {k: jnp.tile(v, j) for k, v in d.items()}

    def blockdiag(w):  # (Cin, Cout) -> (J*Cin, J*Cout)
        # Materialized in-graph per forward (J^2 x the weight bytes,
        # mostly zeros). Weights are tiny next to the activations this
        # layout shrinks, and the path is Mosaic-blocked/experimental —
        # precompute outside the forward if it ever becomes hot.
        return jnp.kron(jnp.eye(j, dtype=w.dtype), w)

    b_, t_, _, c = y.shape
    y = y.reshape(b_, t_, j * c)

    y = fused_gab_packed(
        y, params["gabs"][0], state["gabs"][0], j, sym, con,
        interpret=interpret, tile_budget=cfg.gab_tile_budget,
        precs=resolve_tiers(level_prec("gab0"), KERNEL_OPS),
        form=cfg.gab_form_for(0),
        softmax_group=cfg.gab_softmax_group,
        apply_block=cfg.gab_apply_block,
        score_block=cfg.gab_score_block)

    next_dilation = fw[0]
    i = 1
    while i < cfg.num_levels and cfg.block_channels(i) <= cfg.packed_channels:
        blk_p = params["temporal"][i - 1]
        blk_s = state["temporal"][i - 1]
        lp = level_prec(f"lvl{i}")

        pad, shift = pads[i], shifts[i]
        res = y[:, pad + shift: y.shape[1] - pad + shift]
        wpk = jax.vmap(blockdiag)(blk_p["conv_t"]["w"])  # (fw, JC, JC)
        z = jax.lax.conv_general_dilated(
            y[:, :, None, :], wpk[:, None, :, :], window_strides=(1, 1),
            padding="VALID",
            rhs_dilation=(1 if cfg.dense else next_dilation, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lp("temporal"))[:, :, 0, :]
        z, _ = batch_norm(z, tiled(blk_p["bn_t"]), tiled(blk_s["bn_t"]),
                          train=False)
        z = jax.nn.relu(z)
        z = jnp.matmul(z, blockdiag(blk_p["conv_1"]["w"]),
                       precision=lp("mid1x1"))
        z, _ = batch_norm(z, tiled(blk_p["bn_1"]), tiled(blk_s["bn_1"]),
                          train=False)
        z = jax.nn.relu(z)
        y = res + z

        y = fused_gab_packed(
            y, params["gabs"][i], state["gabs"][i], j, sym, con,
            interpret=interpret, tile_budget=cfg.gab_tile_budget,
            precs=resolve_tiers(level_prec(f"gab{i}"), KERNEL_OPS),
            form=cfg.gab_form_for(i),
            softmax_group=cfg.gab_softmax_group,
            apply_block=cfg.gab_apply_block,
            score_block=cfg.gab_score_block)
        next_dilation *= fw[i]
        i += 1

    c_out = y.shape[-1] // j
    return y.reshape(y.shape[0], y.shape[1], j, c_out), i, next_dilation


def _forward(params, state, x, cfg, *, variant, train, rng,
             level_dtypes=None):

    if level_dtypes is not None:
        # Mixed per-level storage (cfg.storage_dtype_levels, eval only):
        # cast the input and each level's param/state subtrees to that
        # level's dtype up front; activations re-cast at level entry in
        # the loop below. Weight casts are tiny next to the activation
        # bytes this trades.
        from gastx.models.precision import cast_floating

        assert not train, "storage_dtype_levels is eval-only"
        x = x.astype(level_dtypes[0])
        params, state = dict(params), dict(state)
        for k in ("init_bn", "expand_conv", "expand_bn"):
            params[k] = cast_floating(params[k], level_dtypes[0])
            if k in state:
                state[k] = cast_floating(state[k], level_dtypes[0])
        params["gabs"] = tuple(
            cast_floating(p, level_dtypes[i])
            for i, p in enumerate(params["gabs"]))
        state["gabs"] = tuple(
            cast_floating(s, level_dtypes[i])
            for i, s in enumerate(state["gabs"]))
        params["temporal"] = tuple(
            cast_floating(p, level_dtypes[i + 1])
            for i, p in enumerate(params["temporal"]))
        state["temporal"] = tuple(
            cast_floating(s, level_dtypes[i + 1])
            for i, s in enumerate(state["temporal"]))
        params["shrink"] = cast_floating(params["shrink"], level_dtypes[-1])

    statics = graph_statics(cfg.layout)
    fw = cfg.filter_widths
    pads = cfg.pads()
    shifts = cfg.causal_shifts(variant)
    # Resolvers map the kernel-only 2-pass tiers ("high_lhs"/"high_rhs")
    # to "high" for XLA matmul sites; the raw resolver rides along as
    # ``.kernel_raw`` so resolve_tiers (the Pallas-kernel side) sees the
    # unmapped tier (gastx/ops/pallas/precision.py).
    def prec(op: str):
        return xla_precision(cfg.precision_for(op))
    prec.kernel_raw = cfg.precision_for

    def level_prec(tag: str):
        """Resolver with a level-qualified override (e.g. "gab1.attn_proj")
        taking priority over the bare op class."""
        def raw(op: str):
            v = cfg.precision_for(f"{tag}.{op}")
            return v if v is not None else cfg.precision_for(op)

        def p(op: str):
            return xla_precision(raw(op))
        p.kernel_raw = raw
        return p

    def block_rng(i: int):
        return jax.random.fold_in(rng, i) if rng is not None else None

    new_state: Dict = {}

    # Level-0 fusion (explicit opt-in via gab_impl_for(0) ==
    # "pallas_level[_interpret]"): the whole expand prefix [init_bn ->
    # expand_conv -> BN -> ReLU -> GAB0] runs as ONE kernel on the raw
    # 2-lane input (gastx/ops/pallas/fused_level.py fused_level0 — init_bn
    # folds into the conv weights, so the kernel reads ~64x fewer HBM
    # bytes than the per-GAB kernel's expand-output read). Same VMEM gate
    # as the interior level fusion.
    impl0 = cfg.gab_impl_for(0)
    c0 = cfg.block_channels(0)
    l0_fused = (
        not train and variant == "dilated" and not cfg.dense
        and (impl0 in ("pallas_level", "pallas_level_interpret")
             or (impl0 == "auto" and jax.default_backend() == "tpu"))
        and cfg.packed_channels == 0
        and x.dtype == jnp.float32 and c0 <= 256
        and (x.shape[1] - fw[0] + 1) * max(c0, 128) <= 40 * 128)
    if l0_fused:
        from gastx.ops.pallas.fused_gab import KERNEL_OPS
        from gastx.ops.pallas.fused_level import fused_level0
        from gastx.ops.pallas.precision import resolve_tiers

        raw0 = level_prec("lvl0").kernel_raw
        base0 = jax.config.jax_default_matmul_precision or "default"
        y = fused_level0(
            x, params, state,
            tuple(int(v) for v in statics.sym_idx),
            tuple(int(v) for v in statics.con_idx),
            fw=fw[0], interpret=impl0.endswith("_interpret"),
            precs=((("temporal", raw0("expand") or base0),)
                   + resolve_tiers(level_prec("gab0"), KERNEL_OPS)),
            form=cfg.gab_form_for(0),
            softmax_group=cfg.gab_softmax_group,
            apply_block=cfg.gab_apply_block,
            score_block=cfg.gab_score_block)
        # Eval mode: BN state untouched on the fused path.
        new_state["init_bn"] = state["init_bn"]
        new_state["expand_bn"] = state["expand_bn"]
    else:
        y, new_state["init_bn"] = batch_norm(
            x, params["init_bn"], state["init_bn"], train=train)
        y = temporal_conv(y, params["expand_conv"]["w"],
                          stride=fw[0] if variant == "strided" else 1,
                          precision=prec("expand"))
        y, new_state["expand_bn"] = batch_norm(
            y, params["expand_bn"], state["expand_bn"], train=train)
        y = jax.nn.relu(y)

    # Packed narrow-level prefix (eval/dilated only; needs the pallas
    # kernels — interpret for tests, real on TPU backends).
    use_packed = (
        not train and variant == "dilated"
        and cfg.packed_channels >= cfg.channels
        and x.dtype == jnp.float32
        and (cfg.gab_impl in ("pallas", "pallas_interpret")
             or (cfg.gab_impl == "auto"
                 and jax.default_backend() == "tpu")))

    gab_states = []
    temporal_states = []
    if l0_fused:
        gab_states.append(state["gabs"][0])
        start = 1
        next_dilation = fw[0]
    elif use_packed:
        y, start, next_dilation = _packed_prefix(
            params, state, y, cfg, statics, level_prec)
        # Eval mode leaves BN state untouched on every packed level.
        gab_states.extend(state["gabs"][:start])
        temporal_states.extend(state["temporal"][:start - 1])
    else:
        y, s_gab = graph_attention_block(
            y, params["gabs"][0], state["gabs"][0], statics,
            train=train, dropout_rate=cfg.dropout, rng=block_rng(0),
            attn_impl=cfg.attn_impl, local_impl=cfg.local_impl,
            gab_impl=cfg.gab_impl_for(0),
            gab_tile_budget=cfg.gab_tile_budget,
            gab_io_dtype=cfg.gab_io_dtype,
            gab_kernel_form=cfg.gab_form_for(0),
            gab_softmax_group=cfg.gab_softmax_group,
            gab_apply_block=cfg.gab_apply_block,
            gab_score_block=cfg.gab_score_block,
            gab_pbatch_max_pack=cfg.gab_pbatch_max_pack,
            prec=level_prec("gab0"))
        gab_states.append(s_gab)
        start = 1
        next_dilation = fw[0]

    # Level fusion (gab_impl="pallas_level[_interpret]"): the whole
    # [dilated conv -> BN -> ReLU -> 1x1 -> BN -> ReLU -> +res -> GAB]
    # level runs as ONE kernel per batch element where the GAB weights
    # fit VMEM (C <= 256) — the level's three interior activations never
    # touch HBM (gastx/ops/pallas/fused_level.py). Eval/dilated only.
    # "auto" (the production inference default) takes this route on TPU
    # f32 paths: measured strictly better than per-GAB kernels at 27f
    # (14,418/14,385 vs 14,091/14,097 seq/s across two runs, 0.0632mm
    # worst of 24 seeds vs 0.0631 — scripts/perf_lab16.py); bf16-storage
    # activations keep the measured-faster XLA route, and the VMEM gate
    # below falls back per-level for long sequences.
    level_fuse_ok = not train and variant == "dilated" and not cfg.dense

    for i in range(start, cfg.num_levels):
        blk_p = params["temporal"][i - 1]
        blk_s = state["temporal"][i - 1]
        if level_dtypes is not None:
            y = y.astype(level_dtypes[i])

        impl_i = cfg.gab_impl_for(i)
        use_level_fuse = (
            level_fuse_ok
            and (impl_i in ("pallas_level", "pallas_level_interpret")
                 or (impl_i == "auto"
                     and jax.default_backend() == "tpu"
                     and x.dtype == jnp.float32)))
        lp = level_prec(f"lvl{i}")
        ci = cfg.block_channels(i)
        # VMEM gate: the level kernel holds one sequence's T_out rows per
        # grid step, and the GAB temporaries' scoped-VMEM stack scales
        # with rows x max(C,128)/128 (fused_gab's measured 2**12 budget,
        # ~8M at 32 C=128-equivalent rows; 48 OOM'd the 16M limit). 40
        # equivalent rows covers 27f's level 1 (19 rows at C=256 = 38)
        # and keeps headroom for the conv temporaries; longer sequences
        # (whole-sequence bucketed lifting) fall back to the per-GAB
        # kernels below.
        t_out_i = y.shape[1] - (fw[i] - 1) * next_dilation
        fits_vmem = t_out_i * max(ci, 128) <= 40 * 128
        if use_level_fuse and ci <= 256 and fits_vmem:
            from gastx.ops.pallas.fused_gab import KERNEL_OPS
            from gastx.ops.pallas.fused_level import LEVEL_OPS, fused_level
            from gastx.ops.pallas.precision import resolve_tiers

            y = fused_level(
                y, blk_p, blk_s, params["gabs"][i], state["gabs"][i],
                tuple(int(v) for v in statics.sym_idx),
                tuple(int(v) for v in statics.con_idx),
                fw=fw[i], dilation=next_dilation,
                res_off=pads[i] + shifts[i],
                interpret=impl_i.endswith("_interpret"),
                precs=(resolve_tiers(lp, LEVEL_OPS)
                       + resolve_tiers(level_prec(f"gab{i}"), KERNEL_OPS)),
                form=cfg.gab_form_for(i),
                softmax_group=cfg.gab_softmax_group,
                apply_block=cfg.gab_apply_block,
                score_block=cfg.gab_score_block)
            # Eval mode: BN state untouched on the fused path.
            temporal_states.append(blk_s)
            gab_states.append(state["gabs"][i])
            next_dilation *= fw[i]
            continue
        if variant == "strided":
            res = y[:, shifts[i] + fw[i] // 2:: fw[i]]
            z = temporal_conv(y, blk_p["conv_t"]["w"], stride=fw[i],
                              precision=lp("temporal"))
        else:
            pad, shift = pads[i], shifts[i]
            res = y[:, pad + shift: y.shape[1] - pad + shift]
            z = temporal_conv(y, blk_p["conv_t"]["w"],
                              dilation=1 if cfg.dense else next_dilation,
                              precision=lp("temporal"))

        z, s_t = batch_norm(z, blk_p["bn_t"], blk_s["bn_t"], train=train)
        z = jax.nn.relu(z)
        z = pointwise(z, blk_p["conv_1"]["w"], precision=lp("mid1x1"))
        z, s_1 = batch_norm(z, blk_p["bn_1"], blk_s["bn_1"], train=train)
        z = jax.nn.relu(z)
        if train and cfg.dropout > 0.0:
            z = _dropout(z, cfg.dropout, jax.random.fold_in(rng, 1000 + i))
        y = res + z

        y, s_gab = graph_attention_block(
            y, params["gabs"][i], state["gabs"][i], statics,
            train=train, dropout_rate=cfg.dropout, rng=block_rng(i),
            attn_impl=cfg.attn_impl, local_impl=cfg.local_impl,
            gab_impl=impl_i, gab_tile_budget=cfg.gab_tile_budget,
            gab_io_dtype=cfg.gab_io_dtype,
            gab_kernel_form=cfg.gab_form_for(i),
            gab_softmax_group=cfg.gab_softmax_group,
            gab_apply_block=cfg.gab_apply_block,
            gab_score_block=cfg.gab_score_block,
            gab_pbatch_max_pack=cfg.gab_pbatch_max_pack,
            prec=level_prec(f"gab{i}"))

        temporal_states.append({"bn_t": s_t, "bn_1": s_1})
        gab_states.append(s_gab)
        next_dilation *= fw[i]

    y = pointwise(y, params["shrink"]["w"], precision=prec("shrink"))

    new_state["temporal"] = tuple(temporal_states)
    new_state["gabs"] = tuple(gab_states)
    return y, new_state
