"""Parity guardrails for the alternative attention/local-graph layouts.

``GastNetConfig.attn_impl="batched"`` and ``local_impl="gather"`` are
shipped perf knobs (gastx/ops/graph.py: the batched per-head attention
kills the 4-D small-lane score tensor; the gather local conv avoids the
channel-batched adjacency matmul). They must stay numerically equivalent
to the einsum reference path (itself parity-tested against the torch
reference, model/global_attention.py:67-78 / model/local_attention.py:35-53)
— these tests make flipping either knob regression-protected in CI.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gastx.models import GastNetConfig, gastnet_forward, init_gastnet

LAYOUTS = [(17, "h36m17"), (15, "humaneva15")]


def _forward(cfg, params, state, x, variant, train, key=None):
    with jax.default_matmul_precision("highest"):
        y, new_state = gastnet_forward(params, state, x, cfg,
                                       variant=variant, train=train,
                                       rng=key)
    return np.asarray(y), new_state


@pytest.mark.parametrize("num_joints,layout", LAYOUTS)
@pytest.mark.parametrize("attn_impl,local_impl", [
    ("batched", "einsum"), ("einsum", "gather"), ("batched", "gather")])
def test_impl_layouts_match_einsum_eval(num_joints, layout, attn_impl,
                                        local_impl):
    """Eval-mode dilated full forward: alternative layouts == einsum."""
    cfg = GastNetConfig(num_joints_in=num_joints, num_joints_out=num_joints,
                        channels=32, dropout=0.0, layout=layout)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(
        (3, 27, num_joints, 2)).astype(np.float32))

    y_ref, _ = _forward(cfg, params, state, x, "dilated", False)
    cfg_alt = dataclasses.replace(cfg, attn_impl=attn_impl,
                                  local_impl=local_impl)
    y_got, _ = _forward(cfg_alt, params, state, x, "dilated", False)
    np.testing.assert_allclose(y_got, y_ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("attn_impl,local_impl", [("batched", "gather")])
def test_impl_layouts_match_einsum_train(attn_impl, local_impl):
    """Train-mode strided forward (dropout active, BN stats updating): the
    alternative layouts produce the same outputs AND the same updated BN
    state — the impl knobs only change op layout, never rng consumption."""
    cfg = GastNetConfig(channels=32, dropout=0.1)
    params, state = init_gastnet(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((4, 27, 17, 2)).astype(np.float32))
    key = jax.random.PRNGKey(42)

    y_ref, s_ref = _forward(cfg, params, state, x, "strided", True, key)
    cfg_alt = dataclasses.replace(cfg, attn_impl=attn_impl,
                                  local_impl=local_impl)
    y_got, s_got = _forward(cfg_alt, params, state, x, "strided", True, key)

    np.testing.assert_allclose(y_got, y_ref, atol=2e-5, rtol=1e-4)
    ref_leaves, ref_tree = jax.tree_util.tree_flatten(s_ref)
    got_leaves, got_tree = jax.tree_util.tree_flatten(s_got)
    assert ref_tree == got_tree
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5,
                                   rtol=1e-4)


def test_pallas_local_gab_impl_matches_eval():
    """gab_impl="pallas_local" (hybrid: fused local-branch kernel + XLA
    global/concat — the r3 on-chip candidate) == the XLA path, full
    eval forward, interpret mode."""
    cfg = GastNetConfig(dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y_ref, s_ref = _forward(cfg, params, state, x, "dilated", False)
    cfg_p = dataclasses.replace(cfg, gab_impl="pallas_local_interpret")
    y_got, s_got = _forward(cfg_p, params, state, x, "dilated", False)
    np.testing.assert_allclose(y_got, y_ref, atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gab_impl_auto_resolves_to_xla_on_cpu():
    """config_for_frames defaults gab_impl="auto" (r3): on non-TPU
    backends it must resolve to the XLA path and match it exactly."""
    from gastx.models import config_for_frames

    cfg = config_for_frames(27, dropout=0.0)
    assert cfg.gab_impl == "auto"
    params, state = init_gastnet(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))
    y_auto, _ = gastnet_forward(params, state, x, cfg, variant="dilated",
                                train=False)
    cfg_x = dataclasses.replace(cfg, gab_impl="xla")
    y_xla, _ = gastnet_forward(params, state, x, cfg_x, variant="dilated",
                               train=False)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_xla))


def test_storage_dtype_bf16_mechanism():
    """storage_dtype="bfloat16": eval forward computes in bf16 storage but
    returns f32 outputs and the caller's state untouched; "auto" resolves
    to f32 on CPU (bitwise-equal to the default path)."""
    cfg = GastNetConfig(channels=32, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y32, _ = gastnet_forward(params, state, x, cfg, variant="dilated",
                             train=False)
    cfg_bf = dataclasses.replace(cfg, storage_dtype="bfloat16")
    y16, s16 = gastnet_forward(params, state, x, cfg_bf, variant="dilated",
                               train=False)
    assert np.asarray(y16).dtype == np.float32
    # state boundary: identical leaves (eval mode, original state returned)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bf16 compute is close but not equal to f32
    d = np.abs(np.asarray(y16) - np.asarray(y32)).max()
    assert 0 < d < 0.05

    # train mode ignores the storage tier entirely
    key = jax.random.PRNGKey(5)
    yt32, st32 = gastnet_forward(params, state, x, cfg, variant="strided",
                                 train=True, rng=key)
    yt16, st16 = gastnet_forward(params, state, x, cfg_bf, variant="strided",
                                 train=True, rng=key)
    np.testing.assert_array_equal(np.asarray(yt32), np.asarray(yt16))

    cfg_auto = dataclasses.replace(cfg, storage_dtype="auto")
    y_auto, _ = gastnet_forward(params, state, x, cfg_auto,
                                variant="dilated", train=False)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y32))


def test_storage_dtype_levels_mixed():
    """storage_dtype_levels (r4, VERDICT item 3): per-level storage
    overrides — all-"float32" entries under a bf16 global reproduce the
    f32 path bitwise, a single-level f32 restore lands between the bf16
    and f32 programs, state stays untouched, and invalid entries /
    too-many entries / packed_channels combos are rejected."""
    cfg = GastNetConfig(filter_widths=(3, 3), channels=32, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 9, 17, 2)).astype(np.float32))

    y32, _ = gastnet_forward(params, state, x, cfg, variant="dilated",
                             train=False)
    cfg_bf = dataclasses.replace(cfg, storage_dtype="bfloat16")
    y16, _ = gastnet_forward(params, state, x, cfg_bf, variant="dilated",
                             train=False)
    d_bf = np.abs(np.asarray(y16) - np.asarray(y32)).max()

    cfg_allf = dataclasses.replace(
        cfg_bf, storage_dtype_levels=("float32", "float32"))
    y_allf, s_allf = gastnet_forward(params, state, x, cfg_allf,
                                     variant="dilated", train=False)
    np.testing.assert_array_equal(np.asarray(y_allf), np.asarray(y32))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s_allf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for levels in (("float32", ""), ("", "float32")):
        cfg_m = dataclasses.replace(cfg_bf, storage_dtype_levels=levels)
        y_m, _ = gastnet_forward(params, state, x, cfg_m,
                                 variant="dilated", train=False)
        assert np.asarray(y_m).dtype == np.float32
        d_m = np.abs(np.asarray(y_m) - np.asarray(y32)).max()
        assert 0 < d_m < d_bf, (levels, d_m, d_bf)

    with pytest.raises(ValueError, match="storage_dtype_levels"):
        dataclasses.replace(cfg, storage_dtype_levels=("float16",))
    with pytest.raises(ValueError, match="entries"):
        dataclasses.replace(
            cfg, storage_dtype_levels=("", "", "float32"))
    with pytest.raises(ValueError, match="packed_channels"):
        dataclasses.replace(cfg, packed_channels=64,
                            storage_dtype_levels=("float32", ""))


def test_packed_narrow_levels_match_classic():
    """cfg.packed_channels: the packed (B, T, J*C) narrow-level prefix
    (block-diagonal convs + tiled BN + packed fused-GAB kernel) matches
    the classic layout, full eval forward, interpret kernels."""
    cfg = GastNetConfig(filter_widths=(3, 3, 3), channels=32, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y_ref, s_ref = gastnet_forward(params, state, x, cfg,
                                   variant="dilated", train=False)
    for thresh in (32, 64, 128):
        cfg_p = dataclasses.replace(cfg, gab_impl="pallas_interpret",
                                    packed_channels=thresh)
        y_got, s_got = gastnet_forward(params, state, x, cfg_p,
                                       variant="dilated", train=False)
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                        jax.tree_util.tree_leaves(s_got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # train mode / strided ignore the packed flag entirely
    key = jax.random.PRNGKey(6)
    cfg_p = dataclasses.replace(cfg, packed_channels=64)
    yt, _ = gastnet_forward(params, state, x, cfg_p, variant="strided",
                            train=True, rng=key)
    yt_ref, _ = gastnet_forward(params, state, x, cfg, variant="strided",
                                train=True, rng=key)
    np.testing.assert_array_equal(np.asarray(yt), np.asarray(yt_ref))


def test_bf16_storage_through_pallas_kernels():
    """bf16 activations flow through the fused GAB kernels (interpret):
    bf16 HBM in/out, f32 compute inside, f32 boundary, state untouched."""
    cfg = GastNetConfig(filter_widths=(3, 3, 3), channels=32, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 27, 17, 2)).astype(np.float32))

    y32, _ = gastnet_forward(params, state, x, cfg, variant="dilated",
                             train=False)
    cfg_bk = dataclasses.replace(cfg, gab_impl="pallas_interpret",
                                 storage_dtype="bfloat16")
    y_bk, s_bk = gastnet_forward(params, state, x, cfg_bk,
                                 variant="dilated", train=False)
    assert np.asarray(y_bk).dtype == np.float32
    d = np.abs(np.asarray(y_bk) - np.asarray(y32)).max()
    assert 0 < d < 0.05
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s_bk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
