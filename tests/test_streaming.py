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


def test_streaming_batched_streams_equal_independent():
    """Axis 0 of the window ring is a batch of INDEPENDENT streams — the
    serving mode: many live sessions batched into one device step (the
    eval forward has no cross-batch coupling: BN uses running stats).
    A batched lifter must evolve exactly like separate single-stream
    lifters; tiny tolerance covers batch-width-dependent XLA fusion."""
    params, state = init_gastnet(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(2)
    s, t, j = 3, 8, 15
    frames = rng.standard_normal((t, s, j, 2)).astype(np.float32)

    batched = StreamingLifter(params, state, CFG, num_person=s)
    singles = [StreamingLifter(params, state, CFG, num_person=1)
               for _ in range(s)]
    for i in range(t):
        out_b = batched.push(frames[i])
        out_s = np.concatenate([singles[k].push(frames[i, k][None])
                                for k in range(s)])
        np.testing.assert_allclose(out_b, out_s, atol=1e-6)


def test_push_async_matches_push():
    """push_async + deferred fetch (the realtime pipelined loop's 1-deep
    lift pipeline) is push with the np.asarray moved later — identical
    window evolution and results."""
    params, state = init_gastnet(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(3)
    t = 6
    frames = rng.standard_normal((t, 1, 15, 2)).astype(np.float32)

    sync_lifter = StreamingLifter(params, state, CFG, num_person=1)
    async_lifter = StreamingLifter(params, state, CFG, num_person=1)
    sync_out = [sync_lifter.push(frames[i]) for i in range(t)]
    handles = [async_lifter.push_async(frames[i]) for i in range(t)]
    for a, b in zip(sync_out, handles):
        np.testing.assert_array_equal(a, np.asarray(b))
