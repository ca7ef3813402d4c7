"""Pallas fused-kernel numerics (interpret mode — runs on any backend).

The fused global-attention kernel is numerically verified against the XLA
path here. NOTE: this host's axon remote Mosaic compiler rejects the 4-D
small-lane attention shapes (tpu_compile_helper exit 1), so the kernel is not
wired into the default forward yet; on direct-TPU hosts it compiles the same
lowering locally. See gastx/ops/pallas/global_attn.py.
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
