"""Numerical parity of the gastx GastNet against the reference torch model.

Strategy (SURVEY.md §4): instantiate the reference SpatioTemporalModel /
SpatioTemporalModelOptimized1f with random weights, import its state_dict
through gastx.io.torch_import, and assert forward outputs match in fp32 —
the same gate that certifies imported pretrained checkpoints
(27_frame_model.bin) reproduce reference predictions.
"""
import os

import jax
import numpy as np
import pytest

from gastx.models import GastNetConfig, gastnet_forward, init_gastnet, param_count
from gastx.io import params_from_state_dict, state_dict_from_params

from reference_torch import build_reference_model, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

LAYOUT_BY_COUNT = {17: "h36m17", 16: "sh16", 15: "humaneva15", 19: "h36m19"}


def _state_dict_numpy(model):
    # copy: .numpy() views share memory with torch buffers, which train-mode
    # forwards mutate in place (running stats)
    return {k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()}


def _forward_ref(model, x):
    import torch
    with torch.no_grad():
        return model(torch.from_numpy(x)).numpy()


def _forward_gastx(sd, cfg, x, variant, train=False):
    params, state = params_from_state_dict(sd, cfg)
    with jax.default_matmul_precision("highest"):
        y, new_state = gastnet_forward(params, state, x, cfg, variant=variant,
                                       train=train)
    return np.asarray(y), new_state


# Core cases always run; the full matrix (all layouts, 81-frame arch, causal
# strided) is expensive on the 1-core CI host — enable with GASTX_FULL_PARITY=1.
CASES = [
    # (num_joints, filter_widths, channels, causal, variant, T)
    (17, (3, 3, 3), 128, False, "dilated", 50),
    (17, (3, 3, 3), 128, False, "strided", 27),
    (17, (3, 3, 3), 128, True, "dilated", 27),
    (19, (3, 3, 3), 64, False, "dilated", 27),
]
if os.environ.get("GASTX_FULL_PARITY"):
    CASES += [
        (17, (3, 3, 3), 128, False, "dilated", 27),
        (17, (3, 3, 3), 128, True, "strided", 27),
        (16, (3, 3, 3), 64, False, "dilated", 27),
        (15, (3, 3, 3), 64, False, "dilated", 27),
        (17, (3, 3, 3, 3), 64, False, "dilated", 81),
        (17, (3, 3, 3, 3), 64, False, "strided", 81),
    ]


@requires_reference
@pytest.mark.parametrize("num_joints,fw,channels,causal,variant,t", CASES)
def test_forward_parity(num_joints, fw, channels, causal, variant, t):
    model = build_reference_model(num_joints=num_joints, filter_widths=fw,
                                  channels=channels, causal=causal,
                                  variant=variant, seed=7)
    cfg = GastNetConfig(num_joints_in=num_joints, num_joints_out=num_joints,
                        in_features=2, filter_widths=fw, channels=channels,
                        causal=causal, dropout=0.05,
                        layout=LAYOUT_BY_COUNT[num_joints])

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, t, num_joints, 2)).astype(np.float32)

    ref = _forward_ref(model, x)
    got, _ = _forward_gastx(_state_dict_numpy(model), cfg, x, variant)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_parameter_count_matches_reference():
    model = build_reference_model()
    ref_count = sum(p.numel() for p in model.parameters())
    cfg = GastNetConfig()
    params, _ = init_gastnet(jax.random.PRNGKey(0), cfg)
    assert param_count(params) == ref_count


@requires_reference
def test_train_mode_batchnorm_parity():
    """Train-mode forward (batch statistics + running-stat updates) matches
    torch with dropout disabled."""
    import torch

    model = build_reference_model(dropout=0.0)
    model.train()
    cfg = GastNetConfig(dropout=0.0)

    rng = np.random.default_rng(13)
    x = rng.standard_normal((4, 27, 17, 2)).astype(np.float32)

    # Snapshot weights BEFORE the torch forward: train mode updates running
    # stats even under no_grad.
    sd_before = _state_dict_numpy(model)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got, new_state = _forward_gastx(sd_before, cfg, x, "dilated", train=True)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-3)

    # Running stats after one train step must match too.
    ref_sd = _state_dict_numpy(model)
    np.testing.assert_allclose(
        np.asarray(new_state["init_bn"]["mean"]),
        ref_sd["init_bn.running_mean"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["init_bn"]["var"]),
        ref_sd["init_bn.running_var"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["expand_bn"]["mean"]),
        ref_sd["expand_bn.running_mean"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["gabs"][0]["cat_bn"]["mean"]),
        ref_sd["layers_graph_conv.0.cat_bn.running_mean"], atol=1e-5)


@requires_reference
def test_export_roundtrip():
    """gastx -> torch state_dict -> torch model reproduces gastx outputs."""
    import torch

    cfg = GastNetConfig(channels=64)
    params, state = init_gastnet(jax.random.PRNGKey(3), cfg)
    sd = state_dict_from_params(params, state, cfg)

    model = build_reference_model(channels=64)
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()})

    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 27, 17, 2)).astype(np.float32)

    ref = _forward_ref(model, x)
    with jax.default_matmul_precision("highest"):
        got, _ = gastnet_forward(params, state, x, cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_strided_dilated_weight_interchange():
    """The two variants share one parameter tree and agree on the center
    frame for a receptive-field-sized input (model/gast_net.py:186-188)."""
    model = build_reference_model(seed=23)
    cfg = GastNetConfig(dropout=0.05)
    sd = _state_dict_numpy(model)
    params, state = params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(19)
    x = rng.standard_normal((3, 27, 17, 2)).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        y_dil, _ = gastnet_forward(params, state, x, cfg, variant="dilated")
        y_str, _ = gastnet_forward(params, state, x, cfg, variant="strided")
    assert y_dil.shape == (3, 1, 17, 3)
    assert y_str.shape == (3, 1, 17, 3)
    np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_dil),
                               atol=2e-5, rtol=1e-4)
