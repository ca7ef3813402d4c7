"""Pallas fused-kernel numerics (interpret mode — runs on any backend).

The fused kernels are verified against the XLA path here and wired into
the eval forward behind GastNetConfig.gab_impl="pallas" (C<=256 levels run
the whole-block kernel, the C=512 level the two-kernel split form; the
standalone attention-only kernel stays available for experimentation).
In-kernel matmul precision is explicit per op class
(gastx/ops/pallas/precision.py) because Mosaic rejects the ambient HIGH
tier; in interpret mode all tiers are exact f32, matching XLA-on-CPU, so
these parity bounds stay tight.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gastx.models import GastNetConfig, init_gastnet
from gastx.ops import graph as G
from gastx.ops.pallas.global_attn import fused_global_attention


@pytest.mark.parametrize("level,t", [(0, 25), (2, 13)])
def test_fused_global_attention_matches_xla(level, t):
    cfg = GastNetConfig()
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    c = cfg.block_channels(level)
    gp = params["gabs"][level]["global"]
    gs = state["gabs"][level]["global"]

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, t, 17, c)).astype(np.float32))

    ref, _ = G.multi_global_graph(x, gp, gs, train=False, dropout_rate=0.0)

    eps = 1e-5
    scale = gp["cat_bn"]["scale"] / jnp.sqrt(gs["cat_bn"]["var"] + eps)
    shift = gp["cat_bn"]["bias"] - gs["cat_bn"]["mean"] * scale
    got = fused_global_attention(x, gp, scale, shift, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)


@pytest.mark.parametrize("level,t", [(0, 25), (1, 19)])
def test_fused_gab_matches_xla(level, t):
    """Whole-block fused kernel (local sym/con convs + global attention +
    3C->2C concat, gastx/ops/pallas/fused_gab.py) vs the XLA path."""
    from gastx.models import graph_statics
    from gastx.ops.pallas.fused_gab import fused_gab

    cfg = GastNetConfig()
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    c = cfg.block_channels(level)
    gp, gs = params["gabs"][level], state["gabs"][level]
    statics = graph_statics(cfg.layout)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, t, 17, c)).astype(np.float32))
    ref, _ = G.graph_attention_block(x, gp, gs, statics,
                                     train=False, dropout_rate=0.0)
    got = fused_gab(x, gp, gs, tuple(int(i) for i in statics.sym_idx),
                    tuple(int(i) for i in statics.con_idx), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)


def test_fused_gab_split_matches_xla_at_512():
    """The two-kernel split form (local kernel -> HBM -> global+concat
    kernel) at the C=512 widest level vs the XLA path."""
    from gastx.models import graph_statics
    from gastx.ops.pallas.fused_gab import (
        MAX_FUSED_CHANNELS, fused_gab_split)

    cfg = GastNetConfig()
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    c = cfg.block_channels(2)
    assert c == 512 > MAX_FUSED_CHANNELS
    gp, gs = params["gabs"][2], state["gabs"][2]
    statics = graph_statics(cfg.layout)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 13, 17, c)).astype(np.float32))
    ref, _ = G.graph_attention_block(x, gp, gs, statics,
                                     train=False, dropout_rate=0.0)
    got = fused_gab_split(x, gp, gs,
                          tuple(int(i) for i in statics.sym_idx),
                          tuple(int(i) for i in statics.con_idx),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)


@pytest.mark.parametrize("b,c,pack", [(8, 32, 4), (3, 32, 4), (4, 64, 2)])
def test_fused_gab_pbatch_matches_xla(b, c, pack):
    """Frame-packed narrow-channel kernel (fused_gab_pbatch): pack frames
    of the flattened B*T axis ride the lane axis with block-diagonal
    weights — per-frame products identical to the classic kernel,
    accumulation regrouped around exact-zero off-frame slots only. Covers
    a non-pack-divisible frame count (zero-frame padding) and both
    shipped narrow widths."""
    from gastx.models import graph_statics
    from gastx.ops.pallas.fused_gab import fused_gab_pbatch

    cfg = GastNetConfig(filter_widths=(3, 3, 3, 3, 3), channels=32)
    level = {32: 0, 64: 1}[c]
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    gp, gs = params["gabs"][level], state["gabs"][level]
    statics = graph_statics(cfg.layout)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b, 5, 17, c)).astype(np.float32))
    ref, _ = G.graph_attention_block(x, gp, gs, statics,
                                     train=False, dropout_rate=0.0)
    got = fused_gab_pbatch(
        x, gp, gs, tuple(int(i) for i in statics.sym_idx),
        tuple(int(i) for i in statics.con_idx), pack=pack, interpret=True,
        softmax_group=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)


def test_gab_impl_pbatch_full_forward_matches_xla():
    """gab_impl="pallas_pbatch_interpret" through the full 243f-shaped
    forward: the packed route on the C=32/64 levels and the degrade path
    (pack=1 -> whole-block/split kernels) on C>=128 must match XLA."""
    import dataclasses

    from gastx.models import gastnet_forward

    cfg = GastNetConfig(dropout=0.0, filter_widths=(3, 3, 3, 3, 3),
                        channels=32)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 243, 17, 2)).astype(np.float32))
    y_ref, _ = gastnet_forward(params, state, x, cfg,
                               variant="dilated", train=False)
    cfg_p = dataclasses.replace(
        cfg, gab_impl_levels=("pallas_pbatch_interpret",
                              "pallas_pbatch_interpret", "", "", ""))
    y_got, _ = gastnet_forward(params, state, x, cfg_p,
                               variant="dilated", train=False)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_gab_rejects_wide_channels():
    from gastx.models import graph_statics
    from gastx.ops.pallas.fused_gab import MAX_FUSED_CHANNELS, fused_gab

    cfg = GastNetConfig()
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    c = cfg.block_channels(2)
    assert c > MAX_FUSED_CHANNELS
    x = jnp.zeros((1, 3, 17, c), jnp.float32)
    with pytest.raises(ValueError):
        fused_gab(x, params["gabs"][2], state["gabs"][2],
                  tuple(int(i) for i in statics.sym_idx),
                  tuple(int(i) for i in statics.con_idx), interpret=True)


@pytest.mark.parametrize("num_joints,layout", [
    (19, "h36m19"), (16, "sh16"), (15, "humaneva15")])
def test_gab_impl_pallas_full_forward_other_layouts(num_joints, layout):
    """Production routes EVERY inference layout through the fused kernels
    (config_for_frames(frames, num_joints) -> gab_impl="auto"): the
    19-joint toe models (gen_skes.py:49), SH-16 and HumanEva-15 all
    build different static sym/con adjacency tables and (J, J) score
    shapes than the 17-joint tests above — pin their parity too."""
    import dataclasses

    from gastx.models import gastnet_forward

    cfg = GastNetConfig(num_joints_in=num_joints, num_joints_out=num_joints,
                        layout=layout, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(
        (2, 27, num_joints, 2)).astype(np.float32))

    y_ref, _ = gastnet_forward(params, state, x, cfg,
                               variant="dilated", train=False)
    cfg_p = dataclasses.replace(cfg, gab_impl="pallas_interpret")
    y_got, _ = gastnet_forward(params, state, x, cfg_p,
                               variant="dilated", train=False)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-4)


def test_gab_impl_pallas_strided_causal_matches_xla():
    """The kernel route applies to every eval variant, so the causal
    STREAMING step (variant="strided", the realtime CLI's per-frame
    device step via config_for_frames(causal=True) -> gab_impl="auto")
    also runs the fused blocks on TPU — pin its parity, not just the
    dilated offline forward's."""
    import dataclasses

    from gastx.models import gastnet_forward

    cfg = GastNetConfig(dropout=0.0, causal=True)
    params, state = init_gastnet(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(
        (2, cfg.receptive_field(), 17, 2)).astype(np.float32))

    y_ref, _ = gastnet_forward(params, state, x, cfg,
                               variant="strided", train=False)
    cfg_p = dataclasses.replace(cfg, gab_impl="pallas_interpret")
    y_got, _ = gastnet_forward(params, state, x, cfg_p,
                               variant="strided", train=False)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-4)


def test_gab_impl_pallas_full_forward_matches_xla():
    """The gab_impl="pallas" wiring (GastNetConfig flag) end-to-end: the
    full dilated eval forward with fused blocks (C<=256 levels whole-block,
    the C=512 level through the split kernels) matches the default
    forward."""
    from gastx.models import gastnet_forward

    cfg = GastNetConfig(dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y_ref, s_ref = gastnet_forward(params, state, x, cfg,
                                   variant="dilated", train=False)
    import dataclasses
    cfg_p = dataclasses.replace(cfg, gab_impl="pallas_interpret")
    y_got, s_got = gastnet_forward(params, state, x, cfg_p,
                                   variant="dilated", train=False)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-4)
    # Eval-mode BN state is untouched on both paths.
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("causal", [False, True])
def test_gab_impl_pallas_level_matches_xla(causal):
    """Level fusion (gastx/ops/pallas/fused_level.py): the whole
    [dilated conv -> BN -> ReLU -> 1x1 -> BN -> ReLU -> +res -> GAB]
    level as one kernel per batch element. Full forward on a 2-level
    config (level 1 via fused_level; level 0 via fused_level0 — the r4
    expand-prefix fusion with init_bn folded into the conv) vs the XLA
    path, both residual alignments (causal shifts the slice)."""
    import dataclasses

    from gastx.models import gastnet_forward

    cfg = GastNetConfig(dropout=0.0, filter_widths=(3, 3), channels=64,
                        causal=causal)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 15, 17, 2)).astype(np.float32))

    y_ref, s_ref = gastnet_forward(params, state, x, cfg,
                                   variant="dilated", train=False)
    cfg_l = dataclasses.replace(cfg, gab_impl="pallas_level_interpret")
    y_got, s_got = gastnet_forward(params, state, x, cfg_l,
                                   variant="dilated", train=False)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gab_io_bf16_boundary_rounding_only():
    """gab_io_dtype="bfloat16" (boundary-only bf16 HBM I/O for the fused
    blocks): the full forward must equal the f32 kernel path to within
    bf16 boundary-rounding noise — far tighter than full bf16
    storage_dtype — and must be a no-op when gab_impl resolves to XLA."""
    import dataclasses

    from gastx.models import gastnet_forward

    cfg = GastNetConfig(dropout=0.0, gab_impl="pallas_interpret")
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y_ref, _ = gastnet_forward(params, state, x, cfg,
                               variant="dilated", train=False)
    cfg_io = dataclasses.replace(cfg, gab_io_dtype="bfloat16")
    y_got, s_got = gastnet_forward(params, state, x, cfg_io,
                                   variant="dilated", train=False)
    assert y_got.dtype == jnp.float32
    # Interpret mode computes exactly like the f32 path; the only deltas
    # are the bf16 casts at the 3 block boundaries (relative ~2^-9 of
    # activation scale). Full bf16 storage measures ~100x looser here.
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=5e-2, rtol=0)
    assert float(np.max(np.abs(np.asarray(y_got - y_ref)))) > 0.0
    # Eval-mode BN state untouched.
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s_got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # On the XLA route the knob is inert: bitwise-equal forward.
    cfg_x = dataclasses.replace(cfg, gab_impl="xla")
    cfg_xio = dataclasses.replace(cfg_x, gab_io_dtype="bfloat16")
    y_x, _ = gastnet_forward(params, state, x, cfg_x,
                             variant="dilated", train=False)
    y_xio, _ = gastnet_forward(params, state, x, cfg_xio,
                               variant="dilated", train=False)
    np.testing.assert_array_equal(np.asarray(y_x), np.asarray(y_xio))


def test_kdot_high_emulation_accuracy():
    """The kernel-side 3-pass bf16 'high' emulation (precision.kdot with
    interpret=False) vs a float64 reference — runs on CPU, where the bf16
    splits are real and each pass accumulates in f32, matching the TPU MXU
    semantics it emulates. Guards the production path of healthy-Mosaic
    hosts, where every in-kernel dot under matmul_precision="high" goes
    through this decomposition."""
    from gastx.ops.pallas.precision import kdot, kdot_general

    rng = np.random.default_rng(5)
    a = rng.standard_normal((96, 128)).astype(np.float32)
    b = rng.standard_normal((128, 64)).astype(np.float32)
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(exact).max()

    err_high = np.abs(np.asarray(
        kdot(jnp.asarray(a), jnp.asarray(b), "high")) - exact).max() / scale

    # 3-pass drops only the al@bl term: ~2^-16 relative. (On CPU the
    # "default" tier computes in f32, so force the 1-pass bf16 rounding
    # by hand for the comparison baseline.)
    ah = jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32)
    bh = jnp.asarray(b).astype(jnp.bfloat16).astype(jnp.float32)
    err_1pass = np.abs(np.asarray(ah @ bh, np.float64) - exact).max() / scale
    assert err_high < 1e-4
    assert err_high < err_1pass / 10  # far better than 1-pass bf16

    # batched dot_general decomposition agrees with the 2-D path
    a3 = rng.standard_normal((4, 17, 17)).astype(np.float32)
    b3 = rng.standard_normal((4, 17, 32)).astype(np.float32)
    got = np.asarray(kdot_general(
        jnp.asarray(a3), jnp.asarray(b3),
        (((2,), (1,)), ((0,), (0,))), "high"))
    want = np.stack([np.asarray(kdot(jnp.asarray(a3[i]), jnp.asarray(b3[i]),
                                     "high")) for i in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("level,t", [(0, 25), (2, 13)])
def test_pallas_head_attention_matches_xla(level, t):
    """attn_impl="pallas_head": projections/output in XLA, each head's
    score/softmax/apply chain in the single-head kernel
    (gastx/ops/pallas/head_attn.py) — the kernel small enough for this
    host's dot-count-limited remote Mosaic compiler, and the first one
    verified ON the real chip (r2: bitwise-equal to the XLA path)."""
    cfg = GastNetConfig()
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    c = cfg.block_channels(level)
    gp = params["gabs"][level]["global"]
    gs = state["gabs"][level]["global"]

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, t, 17, c)).astype(np.float32))
    ref, _ = G.multi_global_graph(x, gp, gs, train=False, dropout_rate=0.0)
    got, _ = G.multi_global_graph(x, gp, gs, train=False, dropout_rate=0.0,
                                  impl="pallas_head_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)

    # train mode falls back to the differentiable XLA path and still runs
    y, _ = G.multi_global_graph(x, gp, gs, train=True, dropout_rate=0.0,
                                impl="pallas_head_interpret")
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("num_joints,layout", [(17, "h36m17"),
                                               (15, "humaneva15")])
def test_kernel_form_v2_matches_v1(num_joints, layout):
    """The compute-restructured "v2" kernel form (merged wide dots,
    roll-based local aggregation, block-diagonal score projections —
    gastx/ops/pallas/fused_gab.py _local_branch_v2/_global_branch_v2)
    computes the same block as the r3-certified "v1" form: only the
    neighbor-sum order differs (grouped by sublane shift instead of by
    adjacency slot), so the forms agree to f32 roundoff on every entry
    point and the XLA path stays the reference."""
    import dataclasses

    from gastx.models import graph_statics
    from gastx.models.gastnet import gastnet_forward
    from gastx.ops.pallas.fused_gab import fused_gab, fused_gab_split

    cfg = GastNetConfig(num_joints_in=num_joints,
                        num_joints_out=num_joints, layout=layout,
                        dropout=0.0, gab_impl="pallas_interpret")
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    rng = np.random.default_rng(7)

    # per-kernel: whole-block at C=128 and the split form at C=512
    x0 = jnp.asarray(
        rng.standard_normal((2, 25, num_joints, 128)).astype(np.float32))
    gp0, gs0 = params["gabs"][0], state["gabs"][0]
    ref, _ = G.graph_attention_block(x0, gp0, gs0, statics,
                                     train=False, dropout_rate=0.0)
    v2 = fused_gab(x0, gp0, gs0, sym, con, interpret=True, form="v2")
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)

    x2 = jnp.asarray(
        rng.standard_normal((2, 1, num_joints, 512)).astype(np.float32))
    gp2, gs2 = params["gabs"][2], state["gabs"][2]
    v1 = fused_gab_split(x2, gp2, gs2, sym, con, interpret=True, form="v1")
    v2 = fused_gab_split(x2, gp2, gs2, sym, con, interpret=True, form="v2")
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5,
                               rtol=1e-5)

    # full forward, both fused routes (per-GAB and level-fused)
    x = jnp.asarray(
        rng.standard_normal((2, 27, num_joints, 2)).astype(np.float32))
    for impl in ("pallas_interpret", "pallas_level_interpret"):
        c1 = dataclasses.replace(cfg, gab_impl=impl)
        c2 = dataclasses.replace(c1, gab_kernel_form="v2")
        a = gastnet_forward(params, state, x, c1,
                            variant="dilated", train=False)[0]
        b = gastnet_forward(params, state, x, c2,
                            variant="dilated", train=False)[0]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_kernel_form_fold_matches_v1():
    """The score-folded "fold" kernel form: sa_k = (x@Wt_k + bt_k)@pt_k
    == x@(Wt_k@pt_k) + bt_k.pt_k, so the theta/phi projections and all 2K
    rank-1 score dots pre-contract into two thin (C, K) dots (host-side,
    HIGHEST precision). Exact in exact arithmetic; the kernel's C-long
    f32 contraction regroups v1's I-long score sums, so the forms agree
    to roundoff (NOT bitwise) on every entry point — whole-block, split,
    pbatch, level-fused, and the full forward."""
    import dataclasses

    from gastx.models import graph_statics
    from gastx.models.gastnet import gastnet_forward
    from gastx.ops.pallas.fused_gab import (fused_gab, fused_gab_pbatch,
                                            fused_gab_split)

    cfg = GastNetConfig(dropout=0.0, gab_impl="pallas_interpret")
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    rng = np.random.default_rng(17)

    # whole-block at C=128, with the production softmax grouping
    x0 = jnp.asarray(rng.standard_normal((2, 25, 17, 128)).astype(np.float32))
    gp0, gs0 = params["gabs"][0], state["gabs"][0]
    ref, _ = G.graph_attention_block(x0, gp0, gs0, statics,
                                     train=False, dropout_rate=0.0)
    got = fused_gab(x0, gp0, gs0, sym, con, interpret=True, form="fold",
                    softmax_group=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-4)

    # split form at C=512
    x2 = jnp.asarray(rng.standard_normal((2, 1, 17, 512)).astype(np.float32))
    gp2, gs2 = params["gabs"][2], state["gabs"][2]
    v1 = fused_gab_split(x2, gp2, gs2, sym, con, interpret=True, form="v1")
    fd = fused_gab_split(x2, gp2, gs2, sym, con, interpret=True, form="fold")
    np.testing.assert_allclose(np.asarray(fd), np.asarray(v1), atol=1e-5,
                               rtol=1e-4)

    # frame-packed form at C=32 (the folded weight must stay block-
    # diagonal over packed frames: heads_diag zeros the off-sample blocks)
    cfg_n = GastNetConfig(filter_widths=(3, 3, 3, 3, 3), channels=32,
                          dropout=0.0)
    pn, sn = init_gastnet(jax.random.PRNGKey(1), cfg_n)
    xn = jnp.asarray(rng.standard_normal((3, 5, 17, 32)).astype(np.float32))
    refn, _ = G.graph_attention_block(xn, pn["gabs"][0], sn["gabs"][0],
                                      statics, train=False, dropout_rate=0.0)
    gotn = fused_gab_pbatch(
        xn, pn["gabs"][0], sn["gabs"][0], sym, con, pack=4, interpret=True,
        form="fold", softmax_group=8)
    np.testing.assert_allclose(np.asarray(gotn), np.asarray(refn),
                               atol=1e-5, rtol=1e-4)

    # full forward on every fused route
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))
    a = gastnet_forward(params, state, x, cfg,
                        variant="dilated", train=False)[0]
    for impl in ("pallas_interpret", "pallas_level_interpret"):
        cf = dataclasses.replace(cfg, gab_impl=impl,
                                 gab_kernel_form="fold",
                                 gab_softmax_group=8)
        b = gastnet_forward(params, state, x, cf,
                            variant="dilated", train=False)[0]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)

    # per-level form override (gab_kernel_form_levels): fold at level 0
    # only — the r5 adoption shape (fold wins at pbatch stages, v1 stays
    # at the K=8 per-GAB stages)
    cf = dataclasses.replace(cfg, gab_impl="pallas_interpret",
                             gab_kernel_form_levels=("fold", ""),
                             gab_softmax_group=8)
    b = gastnet_forward(params, state, x, cf,
                        variant="dilated", train=False)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-5, rtol=1e-4)


def test_softmax_group_bitwise_equal():
    """gab_softmax_group batches the per-head LeakyReLU/softmax/+C_k
    chains across heads (concat along the sublane axis -> one VPU chain
    per group -> static slices back). Same ops on the same values, so
    every group size must be BITWISE equal to the ungrouped kernel on
    both fused routes (perf_lab21 confirms the same on-chip)."""
    import dataclasses

    from gastx.models import graph_statics
    from gastx.models.gastnet import gastnet_forward
    from gastx.ops.pallas.fused_gab import fused_gab

    cfg = GastNetConfig(dropout=0.0, gab_impl="pallas_interpret")
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    rng = np.random.default_rng(11)

    x0 = jnp.asarray(rng.standard_normal((2, 25, 17, 128)).astype(np.float32))
    gp0, gs0 = params["gabs"][0], state["gabs"][0]
    base = np.asarray(fused_gab(x0, gp0, gs0, sym, con, interpret=True,
                                softmax_group=1))
    for g in (2, 4, 8):
        got = np.asarray(fused_gab(x0, gp0, gs0, sym, con, interpret=True,
                                   softmax_group=g))
        np.testing.assert_array_equal(got, base)
        # blocked apply: one (TM, G*J, J) @ (TM, J, G*g_ch) dot + diagonal
        # block extraction — each block's contraction is the same f32 sum
        got = np.asarray(fused_gab(x0, gp0, gs0, sym, con, interpret=True,
                                   softmax_group=g, apply_block=True))
        np.testing.assert_array_equal(got, base)
        # block-diagonal score dots: same products, but the interleaved
        # zero slots regroup the f32 reduction tree -> 1-2 ulp on the
        # scores (NOT bitwise; see config.gab_score_block)
        got = np.asarray(fused_gab(x0, gp0, gs0, sym, con, interpret=True,
                                   softmax_group=g, score_block=True))
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)

    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))
    for impl in ("pallas_interpret", "pallas_level_interpret"):
        c1 = dataclasses.replace(cfg, gab_impl=impl)
        c8 = dataclasses.replace(c1, gab_softmax_group=8)
        a = gastnet_forward(params, state, x, c1,
                            variant="dilated", train=False)[0]
        b = gastnet_forward(params, state, x, c8,
                            variant="dilated", train=False)[0]
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        csb = dataclasses.replace(c8, gab_score_block=True)
        d = gastnet_forward(params, state, x, csb,
                            variant="dilated", train=False)[0]
        np.testing.assert_allclose(np.asarray(d), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_kdot_two_pass_tiers():
    """The kernel-only 2-pass compensated tiers: "high_lhs" keeps the lhs
    exact (ah@bh + al@bh == a@bf16(b)) and "high_rhs" the rhs. Checked on
    CPU against float64 references with the appropriate operand rounded,
    plus the error ordering default > 2-pass > high."""
    from gastx.models.config import KERNEL_ONLY_TIERS, xla_precision
    from gastx.ops.pallas.precision import kdot, resolve_tiers

    rng = np.random.default_rng(6)
    a = rng.standard_normal((96, 128)).astype(np.float32)
    b = rng.standard_normal((128, 64)).astype(np.float32)
    a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
    bh64 = np.asarray(
        jnp.asarray(b).astype(jnp.bfloat16).astype(jnp.float32), np.float64)
    ah64 = np.asarray(
        jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32), np.float64)
    exact = a64 @ b64
    scale = np.abs(exact).max()

    lhs = np.asarray(kdot(jnp.asarray(a), jnp.asarray(b), "high_lhs"))
    rhs = np.asarray(kdot(jnp.asarray(a), jnp.asarray(b), "high_rhs"))
    # 2-pass == exact product with one operand bf16-rounded (f32 accum)
    assert np.abs(lhs - a64 @ bh64).max() / scale < 5e-6
    assert np.abs(rhs - ah64 @ b64).max() / scale < 5e-6

    err_lhs = np.abs(lhs - exact).max() / scale
    err_high = np.abs(np.asarray(
        kdot(jnp.asarray(a), jnp.asarray(b), "high")) - exact).max() / scale
    err_1pass = np.abs(ah64 @ bh64 - exact).max() / scale
    assert err_high < err_lhs < err_1pass

    # model-side mapping: XLA matmul sites see "high", kernels the raw tier
    for t in KERNEL_ONLY_TIERS:
        assert xla_precision(t) == "high"
    assert xla_precision("default") == "default"

    def raw(op):
        return "high_lhs" if op == "temporal" else None

    def mapped(op):
        return xla_precision(raw(op))
    mapped.kernel_raw = raw
    tiers = dict(resolve_tiers(mapped, ("temporal", "mid1x1")))
    assert tiers["temporal"] == "high_lhs"  # kernels get the raw tier


def test_two_pass_tier_full_forward_runs():
    """A config carrying a kernel-only tier override runs end-to-end on
    both the XLA path (where it must resolve to "high" — XLA has no such
    enum) and the interpret kernel path (where tiers are exact anyway),
    and the two agree with the plain-"high" config exactly on CPU."""
    import dataclasses

    from gastx.models import config_for_frames
    from gastx.models.gastnet import gastnet_forward

    base = dataclasses.replace(
        config_for_frames(27, dropout=0.0), storage_dtype="float32",
        precision_overrides=(), gab_impl="xla")
    two = dataclasses.replace(
        base, precision_overrides=(("temporal", "high_lhs"),
                                   ("mid1x1", "high_rhs")))
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    a = gastnet_forward(params, state, x, base,
                        variant="dilated", train=False)[0]
    b = gastnet_forward(params, state, x, two,
                        variant="dilated", train=False)[0]
    # CPU XLA tiers are all exact f32: identical once mapped to "high"
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    klev = dataclasses.replace(two, gab_impl="pallas_level_interpret")
    c = gastnet_forward(params, state, x, klev,
                        variant="dilated", train=False)[0]
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-5)


def test_gab_impl_levels_hybrid_matches_xla():
    """gab_impl_levels (per-level routing, perf_lab27/28): a hybrid
    forward — XLA narrow levels, fused-kernel wide levels — must match
    the all-XLA forward. Mirrors the production 243f hybrid shape
    (kernels on the C>=128 levels only), in interpret mode so it runs on
    any backend, plus the level-fused impl mixed in."""
    import dataclasses

    from gastx.models import gastnet_forward

    cfg = GastNetConfig(dropout=0.0, filter_widths=(3, 3, 3), channels=32)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y_ref, s_ref = gastnet_forward(params, state, x, cfg,
                                   variant="dilated", train=False)
    for levels in (("", "pallas_interpret", "pallas_interpret"),
                   ("xla", "pallas_level_interpret", "pallas_interpret")):
        cfg_h = dataclasses.replace(cfg, gab_impl_levels=levels)
        assert cfg_h.gab_impl_for(0) == "xla"
        assert cfg_h.gab_impl_for(1) == levels[1]
        y_got, s_got = gastnet_forward(params, state, x, cfg_h,
                                       variant="dilated", train=False)
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                        jax.tree_util.tree_leaves(s_got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kdefault_tier_kernel_only():
    """"kdefault" (the r5 form of the 243f loosening, perf_lab35): a
    1-pass dot ONLY inside kernels — kdot treats it exactly like
    "default" — while every XLA matmul site maps it to "high", so
    train-mode / non-TPU fallbacks keep the certified 3-pass behavior.
    Unknown tier strings must raise instead of silently running 1-pass."""
    import dataclasses

    from gastx.models import config_for_frames
    from gastx.models.config import xla_precision
    from gastx.models.gastnet import gastnet_forward
    from gastx.ops.pallas.precision import kdot

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(kdot(a, b, "kdefault")),
                                  np.asarray(kdot(a, b, "default")))
    with pytest.raises(ValueError, match="unknown kernel precision tier"):
        kdot(a, b, "defalt")
    assert xla_precision("kdefault") == "high"

    # The shipped 243f config carries the kdefault pairs; on a non-TPU
    # backend ("auto" -> XLA) its forward must be BITWISE the forward
    # with the loosening stripped — the leak the r4 advisor flagged.
    cfg = dataclasses.replace(config_for_frames(243, dropout=0.0),
                              filter_widths=(3, 3), channels=32)
    assert dict(cfg.precision_overrides)["attn_proj"] == "kdefault"
    stripped = dataclasses.replace(
        cfg, precision_overrides=tuple(
            p for p in cfg.precision_overrides if p[1] != "kdefault"))
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 9, 17, 2)).astype(np.float32))
    y_loose = gastnet_forward(params, state, x, cfg,
                              variant="dilated", train=False)[0]
    y_strict = gastnet_forward(params, state, x, stripped,
                               variant="dilated", train=False)[0]
    np.testing.assert_array_equal(np.asarray(y_loose), np.asarray(y_strict))


def test_ablate_validated_and_effective():
    """The measurement-only ablate hooks (perf_lab36): a typo'd value must
    raise (it would otherwise silently compile the FULL kernel and the
    ablation would report numbers for a removal that never happened), and
    a valid removal must actually change the output."""
    from gastx.models import graph_statics
    from gastx.ops.pallas.fused_gab import fused_gab, fused_gab_pbatch

    cfg = GastNetConfig(dropout=0.0, filter_widths=(3, 3), channels=32)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    st = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in st.sym_idx)
    con = tuple(int(i) for i in st.con_idx)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 9, 17, 32)).astype(np.float32))
    gp, gs = params["gabs"][0], state["gabs"][0]

    with pytest.raises(ValueError, match="unknown ablate"):
        fused_gab(x, gp, gs, sym, con, interpret=True, ablate="no_softmx")
    with pytest.raises(ValueError, match="unknown ablate"):
        fused_gab_pbatch(x, gp, gs, sym, con, pack=4, interpret=True,
                         ablate="nosoftmax")

    full = fused_gab(x, gp, gs, sym, con, interpret=True)
    for ab in ("no_softmax", "no_apply", "no_global", "no_local",
               "no_locloop", "no_scores"):
        cut = fused_gab(x, gp, gs, sym, con, interpret=True, ablate=ab)
        assert cut.shape == full.shape
        assert not np.allclose(np.asarray(cut), np.asarray(full)), ab
    # pbatch threads ablate through to the packed kernel body.
    cut_p = fused_gab_pbatch(x, gp, gs, sym, con, pack=4, interpret=True,
                             ablate="no_global")
    full_p = fused_gab_pbatch(x, gp, gs, sym, con, pack=4, interpret=True)
    assert not np.allclose(np.asarray(cut_p), np.asarray(full_p))
