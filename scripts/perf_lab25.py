"""Perf lab 25: attn/local impl sweep on the 81f/243f bf16-XLA path.

The shipped narrow-arch inference route (bf16 storage + XLA,
perf_lab8/11) inherits the config defaults attn_impl="einsum" /
local_impl="einsum". The einsum attention materializes the 4-D
(M, Jq, Jm, K) score tensor whose K-lane axis pads ~32x on TPU
(gastx/ops/graph.py::multi_global_graph docstring); the "batched" impl
keeps per-head 3-D (M, Jq, Jm) tensors (Jm in lanes, ~4x less padded
attention traffic). The original layout sweep (scripts/perf_lab.py) ran
at 27f only, where the fused kernels have since made the XLA layout
moot — at 81/243f the XLA path is live and bandwidth-bound
(DESIGN.md: 243f "lane-padding bandwidth-bound"), so the choice is
re-contested here on the shipped shapes.

Measures on-chip, shipped configs (bf16 storage via storage="auto"):
  1. B=1024 seq/s for {einsum,batched} x {einsum,gather} at 81f and 243f;
  2. 8-seed worst |delta| vs the all-"highest" f32 XLA forward for any
     variant that beats the shipped default (budget 0.1 mm) — the
     impls are CI-parity-tested at 2e-5 (tests/test_impl_layouts.py),
     but bf16 re-orders accumulations, so adoption re-certifies.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab25.py
       [--frames 81,243] [--seeds N] [--err attn,local]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

B = 1024
ITERS = 20


def _timed_scan(fwd, params, state, x, iters=ITERS):
    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            return fwd(params, state, xx).sum().astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt, compile_s


def make_fwd(cfg):
    @jax.jit
    def f(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]
    return f


def sweep(frames: int):
    base = config_for_frames(frames, dropout=0.0)  # storage auto -> bf16
    p, s = init_gastnet(jax.random.PRNGKey(0), base)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, frames, 17, 2)).astype(np.float32))
    for attn in ("einsum", "batched"):
        for local in ("einsum", "gather"):
            cfg = dataclasses.replace(base, attn_impl=attn, local_impl=local)
            try:
                v, cs = _timed_scan(make_fwd(cfg), p, s, x)
                print(f"[{frames}f bf16 attn={attn} local={local} B={B}] "
                      f"{v:.0f} seq/s (compile {cs:.0f}s)", flush=True)
            except Exception as exc:
                print(f"[{frames}f attn={attn} local={local}] FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


def err(frames: int, attn: str, local: str, seeds: int):
    base = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                               attn_impl=attn, local_impl=local)
    f32 = dataclasses.replace(base, storage_dtype="float32")
    exact = dataclasses.replace(f32, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla",
                                attn_impl="einsum", local_impl="einsum")
    fwd = make_fwd(base)
    fwd_exact = make_fwd(exact)
    worst = 0.0
    for seed in range(seeds):
        p, s = init_gastnet(jax.random.PRNGKey(seed), f32)
        r = np.random.default_rng(seed)
        x = jnp.asarray(r.standard_normal(
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd(p, s, x))
            - jax.device_get(fwd_exact(p, s, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f attn={attn} local={local}] seed={seed}: "
              f"{d*1000.0:.4f} mm", flush=True)
    print(f"[{frames}f bf16 attn={attn} local={local}] worst of {seeds}: "
          f"{worst:.4f} mm ({'WITHIN' if worst <= 0.1 else 'OVER'} "
          f"0.1mm budget)", flush=True)


def main():
    frames = (81, 243)
    if "--frames" in sys.argv:
        frames = tuple(int(v) for v in
                       sys.argv[sys.argv.index("--frames") + 1].split(","))
    if "--err" in sys.argv:
        attn, local = sys.argv[sys.argv.index("--err") + 1].split(",")
        seeds = 8
        if "--seeds" in sys.argv:
            seeds = int(sys.argv[sys.argv.index("--seeds") + 1])
        for fr in frames:
            err(fr, attn, local, seeds)
        return
    for fr in frames:
        sweep(fr)


if __name__ == "__main__":
    main()
