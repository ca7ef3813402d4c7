"""Perf lab 28: hybrid per-level GAB routing on the narrow architectures.

perf_lab27's stage probe (243f shapes, B=512): the f32-compute fused-GAB
kernels beat the bf16-XLA GAB stages at C>=128 (gab2 101.1 vs 114.4 ms,
gab3 97.0 vs 121.9) and lose/tie at C<=64 (gab0 108.5 vs 99.7, gab1
106.6 vs 108.0). ``GastNetConfig.gab_impl_levels`` now routes each level
independently; this lab measures the end-to-end hybrid combinations
on-chip under the production bf16-storage defaults (B=1024), plus the
8-seed error tail of the winning combo vs the all-"highest" f32 XLA
reference (budget 0.1 mm).

Note the kernels see bf16 HBM I/O here (storage_dtype="auto" casts
activations+params before the levels run) and compute f32 in VMEM —
perf_lab11 measured that slower than bf16-XLA when applied to EVERY
level; the hybrid question is whether the C>=128 levels alone invert.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab28.py
       [--frames 243,81] [--err-only | --speed-only]
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

ITERS = 20
B = 1024
SEEDS = 8

# Per-frames hybrid candidates (one entry per level; "" = inherit the
# config default, which is bf16-XLA on these paths).
COMBOS = {
    243: (  # levels C = 32, 64, 128, 256, 512(T=1)
        ("baseline-xla", ()),
        ("w23", ("", "", "pallas", "pallas", "")),
        ("w123", ("", "pallas", "pallas", "pallas", "")),
        ("w234", ("", "", "pallas", "pallas", "pallas")),
    ),
    81: (  # levels C = 64, 128, 256, 512(T=1)
        ("baseline-xla", ()),
        ("w12", ("", "pallas", "pallas", "")),
        ("w123", ("", "pallas", "pallas", "pallas")),
    ),
}


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


def speed(frames: int):
    base = config_for_frames(frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, frames, 17, 2)).astype(np.float32))
    for name, levels in COMBOS[frames]:
        cfg = dataclasses.replace(base, gab_impl_levels=levels)

        def fwd(p, s, xx, _cfg=cfg):
            return gastnet_forward(p, s, xx, _cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f hybrid {name} B={B}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f hybrid {name}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


def err(frames: int, combo_name: str):
    levels = dict(COMBOS[frames])[combo_name]
    cfg = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                              gab_impl_levels=levels)
    # Error reference: f32 storage, all-"highest", XLA path (the
    # established perf_lab2/8 reference).
    exact = dataclasses.replace(cfg, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla",
                                gab_impl_levels=(),
                                storage_dtype="float32")

    @jax.jit
    def fwd(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]

    @jax.jit
    def fwd_exact(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    worst = 0.0
    for seed in range(SEEDS):
        params, state = init_gastnet(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd(params, state, x))
            - jax.device_get(fwd_exact(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f hybrid {combo_name}] seed={seed}: "
              f"{d*1000.0:.4f} mm", flush=True)
    print(f"[{frames}f hybrid {combo_name}] worst of {SEEDS} seeds: "
          f"{worst:.4f} mm ({'WITHIN' if worst <= 0.1 else 'OVER'} "
          f"0.1mm budget)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", default="243,81",
                    help="comma-separated receptive fields (243,81)")
    ap.add_argument("--err-combo", default="w23",
                    help="combo name for the error sweep")
    ap.add_argument("--err-only", action="store_true")
    ap.add_argument("--speed-only", action="store_true")
    a = ap.parse_args()
    frames = [int(v) for v in a.frames.split(",") if v]
    for f in frames:
        if not a.err_only:
            speed(f)
        if not a.speed_only:
            err(f, a.err_combo if a.err_combo in dict(COMBOS[f]) else
                COMBOS[f][1][0])


if __name__ == "__main__":
    main()
