"""Perf lab 8: the bf16 activation-storage tier + the 243-frame HBM cap.

The r2 roofline (DESIGN.md) proves 27f inference is memory-bound (63% of
HBM peak, ~9% MFU) — bytes are the binding term — and the 243f shipped
config is HBM-*capacity*-capped to B=256 (ch-32 levels pad the 128-lane
dim 4x; B=1024 f32 padded activations exceed v5e HBM). bf16 storage
(gastx/models/precision.py bf16_inference_fn: params+state+inputs cast to
bf16, output f32) halves both terms. This lab measures, on-chip:

  1. seq/s for {27, 81, 243}f with bf16 storage (vs the mixed-f32 default);
  2. max |delta| vs the same-weights all-"highest" f32 forward over seeds
     (the perf_lab2/3/6 error metric; budget 0.1 mm);
  3. the 243f batch ceiling: f32 B=512, bf16 B=512/1024.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab8.py
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.precision import bf16_inference_fn

SEEDS = 4


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


def run_frames(frames: int, batches):
    # Both configs pin storage_dtype explicitly: since r3 made "auto"
    # (bf16-on-TPU) the 81/243f default, an inherited auto would turn the
    # error reference into bf16 too (measured 0.0000 mm — a bf16-vs-bf16
    # comparison, not an error bound). bf16 compute comes solely from the
    # bf16_inference_fn wrapper below.
    mixed = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                                storage_dtype="float32")
    # Pin the error reference to the XLA path: with gab_impl="auto" it
    # would recompile highest-tier variants of every fused kernel level
    # (the error metric wants the established XLA-highest reference
    # anyway).
    exact = dataclasses.replace(mixed, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla")

    def fwd_mixed(p, s, xx):
        return gastnet_forward(p, s, xx, mixed, variant="dilated",
                               train=False)[0]

    fwd_bf16 = bf16_inference_fn(fwd_mixed)

    @jax.jit
    def fwd_exact(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    # --- error over seeds (small batch) ---
    worst = 0.0
    err_jit = jax.jit(fwd_bf16)
    for seed in range(SEEDS):
        params, state = init_gastnet(jax.random.PRNGKey(seed), mixed)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(err_jit(params, state, x))
            - jax.device_get(fwd_exact(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f bf16] seed={seed}: {d*1000.0:.4f} mm",
              flush=True)
    print(f"[{frames}f bf16-storage] worst of {SEEDS} seeds: {worst:.4f} mm "
          f"({'WITHIN' if worst <= 0.1 else 'OVER'} 0.1mm budget)",
          flush=True)

    # --- throughput at the requested batches ---
    params, state = init_gastnet(jax.random.PRNGKey(0), mixed)
    for batch, mode in batches:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (batch, frames, 17, 2)).astype(np.float32))
        fwd = fwd_bf16 if mode == "bf16" else jax.jit(fwd_mixed)
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f {mode} B={batch}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f {mode} B={batch}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


def main():
    import sys

    if "--err-only" in sys.argv:
        # 8-seed robustness confirmation for the adoption decision
        # (the main run measured 4 seeds + throughput).
        global SEEDS
        SEEDS = 8
        run_frames(81, [])
        run_frames(243, [])
        return
    if "--err-81-deep" in sys.argv:
        # 24-seed margin check for the 81f bf16 default (worst of 8 was
        # 0.0904 of the 0.1 budget — the thinnest adopted margin).
        # Measured 2026-08-17: worst of 24 = 0.0995 mm — holds, razor-thin
        # (recorded in DESIGN.md; the adoption stands because the tier is
        # a documented opt-out via storage_dtype="float32").
        SEEDS = 24
        run_frames(81, [])
        return
    if "--err-243-deep" in sys.argv:
        # Same 24-seed margin check for the 243f bf16 default.
        # Measured 2026-08-17: worst of 24 = 0.0335 mm — wide margin, the
        # 8-seed worst was already the 24-seed worst.
        SEEDS = 24
        run_frames(243, [])
        return
    run_frames(27, [(1024, "bf16")])
    run_frames(81, [(1024, "bf16")])
    run_frames(243, [(256, "bf16"), (512, "bf16"), (1024, "bf16"),
                     (512, "mixed-f32")])


if __name__ == "__main__":
    main()
