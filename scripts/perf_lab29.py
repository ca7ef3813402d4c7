"""Perf lab 29: batch-packed narrow-channel kernels on the 243f/81f archs.

perf_lab26 attributed 97% of the 243f forward to the GAB stages and showed
their cost is nearly C-independent (99.7 ms at C=32 vs 121.9 at C=256 for
an 8x channel range): the binding term is lane padding + per-op dispatch
on small-C slivers, not math. ``fused_gab_pbatch`` packs P = 128//C whole
samples into the lane axis with block-diagonal weights — one MXU pass
computes P samples, and every dispatch amortizes over P — with NO
in-kernel lane->sublane cast (the wall that killed the joint-packed
layout, DESIGN.md).

This lab measures end-to-end combinations on-chip under the production
bf16-storage defaults (B=1024), extending perf_lab28's hybrid sweep:
pbatch on the C<128 levels stacked with the plain kernels on C>=128.
The error sweep compares the winner against the all-"highest" f32 XLA
reference (budget 0.1 mm), at 8 seeds by default and 24 with --deep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab29.py
       [--frames 243,81] [--err-only | --speed-only] [--err-combo NAME]
       [--deep] [--f32]
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

PB = "pallas_pbatch"
# One entry per level; "" = inherit (bf16-XLA on these production paths).
COMBOS = {
    243: (  # levels C = 32, 64, 128, 256, 512(T=1)
        ("baseline-xla", ()),
        ("pb01", (PB, PB, "", "", "")),
        ("pb01-w234", (PB, PB, "pallas", "pallas", "pallas")),
        ("pb0-w1234", (PB, "pallas", "pallas", "pallas", "pallas")),
        ("pb1-w234", ("", PB, "pallas", "pallas", "pallas")),
    ),
    81: (  # levels C = 64, 128, 256, 512(T=1)
        ("baseline-xla", ()),
        ("pb0", (PB, "", "", "")),
        ("pb0-w123", (PB, "pallas", "pallas", "pallas")),
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


def _base(frames: int, f32: bool):
    cfg = config_for_frames(frames, dropout=0.0)
    if f32:
        cfg = dataclasses.replace(cfg, storage_dtype="float32")
    return cfg


def speed(frames: int, f32: bool):
    base = _base(frames, f32)
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, frames, 17, 2)).astype(np.float32))
    tag = "f32" if f32 else "bf16"
    for name, levels in COMBOS[frames]:
        cfg = dataclasses.replace(base, gab_impl_levels=levels)

        def fwd(p, s, xx, _cfg=cfg):
            return gastnet_forward(p, s, xx, _cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f {tag} {name} B={B}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f {tag} {name}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


def err(frames: int, combo_name: str, seeds: int, f32: bool):
    levels = dict(COMBOS[frames])[combo_name]
    cfg = dataclasses.replace(_base(frames, f32), gab_impl_levels=levels)
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

    tag = "f32" if f32 else "bf16"
    worst = 0.0
    for seed in range(seeds):
        params, state = init_gastnet(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd(params, state, x))
            - jax.device_get(fwd_exact(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f {tag} {combo_name}] seed={seed}: "
              f"{d*1000.0:.4f} mm", flush=True)
    print(f"[{frames}f {tag} {combo_name}] worst of {seeds} seeds: "
          f"{worst:.4f} mm ({'WITHIN' if worst <= 0.1 else 'OVER'} "
          f"0.1mm budget)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", default="243,81")
    ap.add_argument("--err-combo", default="pb01-w234")
    ap.add_argument("--err-only", action="store_true")
    ap.add_argument("--speed-only", action="store_true")
    ap.add_argument("--deep", action="store_true",
                    help="24-seed error sweep (default 8)")
    ap.add_argument("--f32", action="store_true",
                    help="f32 storage instead of the bf16 production default")
    a = ap.parse_args()
    seeds = 24 if a.deep else 8
    for f in [int(v) for v in a.frames.split(",") if v]:
        if not a.err_only:
            speed(f, a.f32)
        if not a.speed_only:
            err(f, a.err_combo if a.err_combo in dict(COMBOS[f]) else
                COMBOS[f][1][0], seeds, a.f32)


if __name__ == "__main__":
    main()
