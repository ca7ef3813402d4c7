"""Perf lab 12: fused-GAB kernel row-tile budget sweep (27f e2e).

The 4096 budget (32 rows at C=128 / 16 at C=256 / 8 at the C=512 split)
was picked to keep the scoped-VMEM stack ~8M of 16M after the 2**14
default OOM'd at 31.28M. Larger tiles amortize per-tile weight reloads
and grid overhead — if they compile. 8192 (64 rows at C=128) projects a
~15.6M stack: expected compile-OOM, probed to confirm the edge.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab12.py [budget]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet


def e2e(budget: int):
    cfg = dataclasses.replace(config_for_frames(27, dropout=0.05),
                              gab_tile_budget=budget)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    batch, iters = 1024, 30

    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * 1e-12
            y, _ = gastnet_forward(params, state, xx, cfg,
                                   variant="dilated", train=False)
            return y.sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 27, 17, 2)).astype(
        np.float32))
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    print(f"budget={budget}: compiled in {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    print(f"budget={budget}: {batch * iters / dt:.0f} seq/s", flush=True)


if __name__ == "__main__":
    e2e(int(sys.argv[1]) if len(sys.argv) > 1 else 6144)
