"""Config-surface tests: the shipped frames->architecture table and the
measured mixed-precision override plumbing (gastx/models/config.py).

The override *numbers* (14.1k seq/s @ max 0.0631mm over 24 seeds, r3c) are
TPU-measured in scripts/perf_lab2/3/13.py; on the CPU backend every precision
tier computes plain fp32, so here we pin the plumbing: the inference entry
carries the preset, resolution order is level-qualified > bare class >
inherit, and the mixed forward is numerically identical to all-"high" on
CPU (proving the overrides change only matmul precision, not math).
"""
import jax
import numpy as np
import pytest

from gastx.models import (
    TPU_MIXED_PRECISION_OVERRIDES,
    TPU_MIXED_SAFE_OVERRIDES,
    GastNetConfig,
    config_for_frames,
    gastnet_forward,
    init_gastnet,
)


def test_config_for_frames_table():
    """reconstruction.py:220-228 / gen_skes.py:43-97 architecture table."""
    for frames, fw, ch in ((27, (3, 3, 3), 128), (81, (3, 3, 3, 3), 64),
                           (243, (3, 3, 3, 3, 3), 32)):
        cfg = config_for_frames(frames)
        assert cfg.filter_widths == fw and cfg.channels == ch
        assert cfg.receptive_field() == frames
    assert config_for_frames(27, 19).layout == "h36m19"
    assert config_for_frames(27, 16).layout == "sh16"
    assert config_for_frames(27, 15).layout == "humaneva15"
    with pytest.raises(ValueError):
        config_for_frames(55)


def test_inference_entry_carries_mixed_preset():
    cfg = config_for_frames(27)
    assert cfg.precision_overrides == TPU_MIXED_PRECISION_OVERRIDES
    assert config_for_frames(27, precision_overrides=()).precision_overrides \
        == ()
    # Training configs built directly stay all-"high" (no overrides).
    assert GastNetConfig().precision_overrides == ()
    # Since the r3 24-seed re-certification promoted attn_cat to "high"
    # (perf_lab13: the 6-op preset's tail measured 0.1088 mm at 24 seeds),
    # the production preset IS the historical safe preset, and attn_cat
    # must never reappear at the "default" tier.
    assert TPU_MIXED_SAFE_OVERRIDES == TPU_MIXED_PRECISION_OVERRIDES
    assert ("attn_cat", "default") not in TPU_MIXED_PRECISION_OVERRIDES


def test_243f_kernel_route_tier_loosening():
    """r4 perf_lab35 adoption: the 243f default ("auto" route + default
    preset) drops the three in-kernel 3-pass dot classes to 1-pass
    (1,361 vs 1,259 seq/s at 0.0321 mm worst of 24); explicit impl or
    preset choices keep their own certified error tables."""
    cfg = config_for_frames(243)
    got = dict(cfg.precision_overrides)
    # "kdefault" = 1-pass ONLY inside the Pallas kernels; XLA matmul
    # sites (train, non-TPU fallbacks) map it back to "high" (r5 fix).
    assert got["attn_proj"] == got["attn_cat"] == got["gab_cat"] \
        == "kdefault"
    from gastx.models.config import xla_precision
    assert xla_precision("kdefault") == "high"
    # The loosening must precede (and not replace) the mixed preset.
    assert cfg.precision_overrides[3:] == TPU_MIXED_PRECISION_OVERRIDES
    # Opt-outs: explicit XLA route / explicit preset / other frame counts.
    assert config_for_frames(243, gab_impl="xla").precision_overrides \
        == TPU_MIXED_PRECISION_OVERRIDES
    assert config_for_frames(
        243, precision_overrides=()).precision_overrides == ()
    for frames in (27, 81):
        assert "attn_proj" not in dict(
            config_for_frames(frames).precision_overrides)
    # r5 fold adoption rides the same gate: fold at gab0 only on the
    # default 243f auto route (1,381 seq/s at 0.0329 mm worst of 24),
    # v1 everywhere else and on every opt-out path.
    assert cfg.gab_kernel_form_levels == ("fold",)
    assert cfg.gab_form_for(0) == "fold" and cfg.gab_form_for(1) == "v1"
    assert config_for_frames(243, gab_impl="xla").gab_kernel_form_levels \
        == ()
    assert config_for_frames(
        243, precision_overrides=()).gab_kernel_form_levels == ()
    for frames in (27, 81):
        assert config_for_frames(frames).gab_kernel_form_levels == ()


def test_precision_for_resolution():
    cfg = GastNetConfig(precision_overrides=(
        ("gab1.attn_proj", "highest"), ("attn_proj", "default")))
    # Bare class resolves; unknown class inherits (None).
    assert cfg.precision_for("attn_proj") == "default"
    assert cfg.precision_for("temporal") is None
    # Level-qualified entries are matched by the forward's level resolver
    # (gastnet.py level_prec): qualified beats bare.
    assert cfg.precision_for("gab1.attn_proj") == "highest"


def test_mixed_forward_matches_high_on_cpu():
    base = GastNetConfig(filter_widths=(3, 3), channels=16, dropout=0.0)
    mixed = GastNetConfig(
        filter_widths=(3, 3), channels=16, dropout=0.0,
        precision_overrides=TPU_MIXED_PRECISION_OVERRIDES)
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    x = np.random.default_rng(0).standard_normal((4, 9, 17, 2)).astype(
        np.float32)
    y_hi, _ = gastnet_forward(params, state, x, base, variant="dilated",
                              train=False)
    y_mx, _ = gastnet_forward(params, state, x, mixed, variant="dilated",
                              train=False)
    np.testing.assert_array_equal(np.asarray(y_hi), np.asarray(y_mx))


def test_level_qualified_override_forward_runs():
    cfg = GastNetConfig(filter_widths=(3, 3), channels=16, dropout=0.0,
                        precision_overrides=(("gab1.attn_proj", "highest"),
                                             ("lvl1.temporal", "high")))
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((2, 9, 17, 2)).astype(
        np.float32)
    y, _ = gastnet_forward(params, state, x, cfg, variant="dilated",
                           train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_trainval_matmul_precision_flag():
    """The gastx-only --matmul-precision trainval knob maps onto the config
    tiers measured in scripts/perf_lab5.py (high default; mixed = "high" +
    TPU_MIXED_PRECISION_OVERRIDES; default = all-"default")."""
    from gastx.cli.arguments import parse_args
    from gastx.cli.trainval import build_config
    from gastx.models.config import TPU_MIXED_PRECISION_OVERRIDES

    class _Skel:
        def num_joints(self):
            return 17

    class _DS:
        def skeleton(self):
            return _Skel()

    base = ["-arc", "3,3", "-ch", "16"]
    cfg = build_config(parse_args(base), _DS())
    assert cfg.matmul_precision == "high" and cfg.precision_overrides == ()

    cfg = build_config(parse_args(base + ["--matmul-precision", "mixed"]),
                       _DS())
    assert cfg.matmul_precision == "high"
    assert cfg.precision_overrides == TPU_MIXED_PRECISION_OVERRIDES

    cfg = build_config(parse_args(base + ["--matmul-precision", "default"]),
                       _DS())
    assert cfg.matmul_precision == "default"
    assert cfg.precision_overrides == ()


def test_gab_kernel_form_levels_validation():
    """Per-level kernel-form overrides (r5 fold adoption plumbing) are
    validated at construction like gab_impl_levels."""
    cfg = GastNetConfig(gab_kernel_form_levels=("fold", "inherit", ""))
    assert cfg.gab_form_for(0) == "fold"
    assert cfg.gab_form_for(1) == "v1"   # inherit -> gab_kernel_form
    assert cfg.gab_form_for(2) == "v1"   # "" -> gab_kernel_form
    assert cfg.gab_form_for(9) == "v1"   # beyond the list -> base
    with pytest.raises(ValueError):
        GastNetConfig(gab_kernel_form_levels=("nope",))
    with pytest.raises(ValueError):
        GastNetConfig(filter_widths=(3, 3),
                      gab_kernel_form_levels=("v1", "v1", "v1"))
