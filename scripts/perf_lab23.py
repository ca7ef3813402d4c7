"""Perf lab 23: re-contest the 81f/243f routing + tile budget after the
batched-softmax adoption.

perf_lab21/19 made the fused-kernel path ~25% faster (27f: 14.4k ->
18.1k seq/s). Two routing decisions were taken against the OLD kernel
speed and deserve a re-match:

  1. 81f/243f inference default = bf16 storage + XLA (perf_lab8/11:
     f32-kernels measured 3,299 / 894 seq/s vs bf16-XLA 4,316 / 1,133;
     bf16+kernels lost AND broke the budget at 81f). If f32 kernels now
     reach ~4.1-4.6k at 81f they tie-or-beat bf16-XLA with ~5x more
     error headroom (f32-kernel error ~0.02 mm vs bf16's 0.0995 at 24
     seeds).
  2. The gab_tile_budget=4096 optimum (perf_lab12) was swept with the
     per-head softmax chains; batching changed both the per-grid-step
     dispatch overhead (fewer ops) and the temporary footprint (bigger
     concatenated tensors), so re-sweep 32/40/64 rows at C=128.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab23.py
       [--skip-tiles] [--skip-frames]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

# 243f at B=1024 f32 storage previously exceeded HBM; bench uses B=256
# there for f32 paths. Match bench's batch choices per frames.
BATCHES = {27: 1024, 81: 1024, 243: 256}


def _timed_scan(fwd, params, state, x, iters=30):
    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            return fwd(params, state, xx).sum().astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt, cs


def run_frames():
    for frames in (81, 243):
        b = BATCHES[frames]
        base = config_for_frames(frames, dropout=0.0)
        # force f32 storage + the fused-kernel route
        cfg = dataclasses.replace(base, storage_dtype="float32",
                                  gab_impl="pallas_level")
        params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (b, frames, 17, 2)).astype(np.float32))

        @jax.jit
        def fwd(p, s, xx, cfg=cfg):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f f32-kernels B={b}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f f32-kernels] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


def run_tiles():
    frames, b = 27, 1024
    base = config_for_frames(frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (b, frames, 17, 2)).astype(np.float32))
    for budget in (4096, 5120, 8192):
        cfg = dataclasses.replace(base, gab_tile_budget=budget)

        @jax.jit
        def fwd(p, s, xx, cfg=cfg):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[27f tile_budget={budget} ({budget // 128} rows at "
                  f"C=128)] {v:.0f} seq/s (compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[27f tile_budget={budget}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    if "--skip-tiles" not in sys.argv:
        run_tiles()
    if "--skip-frames" not in sys.argv:
        run_frames()
