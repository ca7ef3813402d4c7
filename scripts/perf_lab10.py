"""Perf lab 10: the packed narrow-level layout on-chip (243f/81f).

perf_lab8 proved 243f is bandwidth-bound on ch-32 lane padding (bf16
storage lifts 894 -> 1131 seq/s and removes the B-capacity cap, but
throughput is flat in B). The packed layout (GastNetConfig.
packed_channels; gastx/models/gastnet.py _packed_prefix) attacks the
padding itself: narrow levels store (B, T, J*C) — 1.18x padding instead
of 5.65x — with block-diagonal convs and the packed fused-GAB kernel.

Measures per architecture: packed-f32 seq/s (vs the bf16-XLA and
plain-pallas rows from lab8/bench) + worst-seed error vs all-"highest".

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab10.py
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet


def _timed_scan(cfg, params, state, x, iters=30):
    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * 1e-12
            y, _ = gastnet_forward(params, state, xx, cfg,
                                   variant="dilated", train=False)
            return y.sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt, cs


def run(frames: int, packed: int, batches, seeds: int = 4):
    cfg = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                              packed_channels=packed)
    exact = dataclasses.replace(cfg, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla",
                                packed_channels=0)

    @jax.jit
    def fwd_p(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]

    @jax.jit
    def fwd_e(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    worst = 0.0
    for seed in range(seeds):
        params, state = init_gastnet(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(jax.device_get(fwd_p(params, state, x))
                                  - jax.device_get(fwd_e(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f packed<={packed}] seed={seed}: "
              f"{d*1000.0:.4f} mm", flush=True)
    print(f"[{frames}f packed<={packed}] worst of {seeds} seeds: "
          f"{worst:.4f} mm ({'WITHIN' if worst <= 0.1 else 'OVER'} budget)",
          flush=True)

    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    for batch in batches:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (batch, frames, 17, 2)).astype(np.float32))
        try:
            v, cs = _timed_scan(cfg, params, state, x)
            print(f"[{frames}f packed<={packed} B={batch}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f packed<={packed} B={batch}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


def main():
    import sys

    if "--81" in sys.argv:
        run(81, 64, [1024])
    else:
        run(243, 64, [256, 512])


if __name__ == "__main__":
    main()
