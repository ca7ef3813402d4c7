"""Streaming (real-time causal) lifting tests."""
import jax
import numpy as np
import pytest

from gastx.infer.streaming import StreamingLifter
from gastx.models import GastNetConfig, gastnet_forward, init_gastnet

CFG = GastNetConfig(num_joints_in=15, num_joints_out=15,
                    filter_widths=(3, 3), channels=8, dropout=0.0,
                    causal=True, layout="humaneva15")


def test_streaming_matches_offline_causal():
    """Frame-by-frame streaming equals the strided causal model evaluated on
    explicit receptive-field windows."""
    params, state = init_gastnet(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    t, j = 30, 15
    seq = rng.standard_normal((t, j, 2)).astype(np.float32)

    lifter = StreamingLifter(params, state, CFG, num_person=1)
    stream_out = np.stack([lifter.push(seq[i][None])[0] for i in range(t)])

    rf = CFG.receptive_field()
    # offline: edge-pad rf-1 frames at the start, slide the window
    padded = np.concatenate([np.repeat(seq[:1], rf - 1, axis=0), seq])
    windows = np.stack([padded[i:i + rf] for i in range(t)])
    offline, _ = gastnet_forward(params, state, windows, CFG,
                                 variant="strided", train=False)
    offline = np.asarray(offline)[:, 0]

    np.testing.assert_allclose(stream_out, offline, atol=1e-5, rtol=1e-4)


def test_streaming_requires_causal():
    cfg = GastNetConfig(num_joints_in=15, num_joints_out=15,
                        filter_widths=(3, 3), channels=8,
                        layout="humaneva15")
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError):
        StreamingLifter(params, state, cfg)


def test_streaming_multi_person():
    params, state = init_gastnet(jax.random.PRNGKey(0), CFG)
    lifter = StreamingLifter(params, state, CFG, num_person=2)
    rng = np.random.default_rng(1)
    out = lifter.push(rng.standard_normal((2, 15, 2)).astype(np.float32))
    assert out.shape == (2, 15, 3)
    assert np.isfinite(out).all()
