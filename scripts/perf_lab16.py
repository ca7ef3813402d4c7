"""Perf lab 16: level-fused kernels on-chip (conv chain + GAB, one pass).

gab_impl="pallas_level" fuses each whole architecture level (dilated
conv -> BN -> ReLU -> 1x1 -> BN -> ReLU -> +residual -> whole GAB) into
one kernel per batch element wherever the GAB weights fit VMEM (C<=256)
— the level's three interior activations (conv out, 1x1 out, residual
sum) never touch HBM (gastx/ops/pallas/fused_level.py). At 27f that is
level 1; levels 0/2 keep the r3 whole-block/split kernels. By the
DESIGN.md traffic accounting the level-1 interior is ~2 MB of the ~5.3 MB
per-sequence f32 traffic, so the ceiling is ~1.6x; this lab measures
what is realized.

Measures, on-chip per --frames {27,81,243} (default 27):
  1. worst |delta| vs the same-weights XLA-"highest" f32 forward over
     seeds (budget 0.1 mm; 8 seeds default, 24 with --deep);
  2. B=1024 seq/s: gab_impl="pallas" (r3 prod) vs "pallas_level".

At 81f/243f the f32 path is not the shipped default (bf16-XLA is); the
comparison there tells whether level fusion makes f32 competitive again
(it would also retire 81f's razor-thin 0.0995mm bf16 margin).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab16.py
       [--frames N] [--deep] [--err-only | --time-only]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet


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
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt, compile_s


def main():
    deep = "--deep" in sys.argv
    seeds = 24 if deep else 8
    frames = 27
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    prod = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                               storage_dtype="float32", gab_impl="pallas")
    level = dataclasses.replace(prod, gab_impl="pallas_level")
    exact = dataclasses.replace(prod, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla")

    def make_fwd(cfg):
        @jax.jit
        def f(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        return f

    fwd_prod, fwd_level, fwd_exact = map(make_fwd, (prod, level, exact))

    if "--time-only" not in sys.argv:
        worst = 0.0
        for seed in range(seeds):
            params, state = init_gastnet(jax.random.PRNGKey(seed), prod)
            rng = np.random.default_rng(seed)
            x = jnp.asarray(rng.standard_normal(
                (64, frames, 17, 2)).astype(np.float32))
            d = float(jnp.max(jnp.abs(
                jax.device_get(fwd_level(params, state, x))
                - jax.device_get(fwd_exact(params, state, x)))))
            worst = max(worst, d * 1000.0)
            print(f"  [{frames}f level] seed={seed}: {d*1000.0:.4f} mm",
                  flush=True)
        print(f"[{frames}f pallas_level] worst of {seeds} seeds: "
              f"{worst:.4f} mm "
              f"({'WITHIN' if worst <= 0.1 else 'OVER'} 0.1mm budget)",
              flush=True)

    if "--err-only" in sys.argv:
        return

    params, state = init_gastnet(jax.random.PRNGKey(0), prod)
    rng = np.random.default_rng(0)
    batch = 1024 if frames != 243 else 256  # f32 243f capacity cap
    x = jnp.asarray(rng.standard_normal(
        (batch, frames, 17, 2)).astype(np.float32))
    for name, fwd in (("pallas prod", fwd_prod),
                      ("pallas_level", fwd_level)):
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f {name} B={x.shape[0]}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f {name} B={x.shape[0]}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    main()
