"""Perf lab 15: bf16 HBM I/O at the fused-kernel block boundaries (27f).

DESIGN.md's r3 roofline note: the adopted whole-block kernels still pay
the (M, J, C)/(M, J, 2C) level inputs/outputs through HBM — the remaining
gap to roofline is inter-level traffic. perf_lab11 showed FULL bf16
storage + kernels loses to bf16-XLA on the narrow archs, but at 27f full
bf16 is over budget (0.26 mm) regardless, so the open question is the
*hybrid*: f32 storage + "high" convs, with only the kernel boundaries
cast to bf16 (GastNetConfig.gab_io_dtype="bfloat16" — kernels upcast on
VMEM load and compute f32, so the precision cost is boundary rounding
only, ~2^-9 relative at 6 crossings).

Measures, on-chip at 27f/17j:
  1. worst |delta| vs the same-weights XLA-"highest" f32 forward over
     seeds (budget 0.1 mm; 8 seeds default, 24 with --deep);
  2. B=1024 seq/s: production default (f32 I/O kernels) vs bf16-I/O.

For 81/243 frames (--frames N) the question inverts: the shipped default
there is FULL bf16 storage on the XLA path (4,316 / 1,133 seq/s at
0.0995/0.0335 mm worst of 24) — the hybrid trades some of that bandwidth
win for exact-f32 kernel compute + "high" convs, i.e. a much wider error
margin than 81f's razor-thin 0.5 µm.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab15.py
       [--frames 27|81|243] [--deep] [--err-only | --time-only]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

FRAMES = 27


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
    frames = FRAMES
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    # f32-storage config with fused kernels (the 27f production shape;
    # for 81/243f this overrides the bf16-storage default to isolate the
    # kernel-boundary I/O lever).
    prod = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                               storage_dtype="float32", gab_impl="pallas")
    hybrid = dataclasses.replace(prod, gab_io_dtype="bfloat16")
    # Error reference: XLA all-"highest" (the established lab2/8/13 ref).
    exact = dataclasses.replace(prod, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla")

    def make_fwd(cfg):
        @jax.jit
        def f(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        return f

    fwd_prod, fwd_hyb, fwd_exact = map(make_fwd, (prod, hybrid, exact))

    if "--time-only" not in sys.argv:
        worst = 0.0
        for seed in range(seeds):
            params, state = init_gastnet(jax.random.PRNGKey(seed), prod)
            rng = np.random.default_rng(seed)
            x = jnp.asarray(rng.standard_normal(
                (64, frames, 17, 2)).astype(np.float32))
            d = float(jnp.max(jnp.abs(
                jax.device_get(fwd_hyb(params, state, x))
                - jax.device_get(fwd_exact(params, state, x)))))
            worst = max(worst, d * 1000.0)
            print(f"  [{frames}f bf16-io] seed={seed}: {d*1000.0:.4f} mm",
                  flush=True)
        print(f"[{frames}f gab_io_dtype=bf16] worst of {seeds} seeds: "
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
    for name, fwd in (("f32-io kernels", fwd_prod), ("bf16-io kernels", fwd_hyb)):
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f {name} B={x.shape[0]}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f {name} B={x.shape[0]}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
