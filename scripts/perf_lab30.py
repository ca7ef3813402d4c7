"""Perf lab 30: fused level 0 (expand prefix) on the 27f flagship.

r4: fused_level0 runs [init_bn -> expand_conv -> BN -> ReLU -> GAB0] as
one kernel per sequence on the RAW 2-lane input (init_bn folds into the
conv weights), replacing the XLA expand dispatches + the per-GAB kernel's
(B,25,17,128) HBM read. VERDICT r3 item 6 projects single-digit %.

A/B on-chip at B=1024 under production defaults (mixed precision, level
fusion at level 1, split kernels at C=512), plus the 8-seed (24 with
--deep) error tail of the l0 route vs the all-"highest" f32 XLA reference.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab30.py
       [--err-only | --speed-only] [--deep]
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

ITERS = 50
B = 1024
FRAMES = 27

COMBOS = (
    ("production-auto", ()),
    ("l0-fused", ("pallas_level", "", "")),
)


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


def speed():
    base = config_for_frames(FRAMES, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, FRAMES, 17, 2)).astype(np.float32))
    for name, levels in COMBOS:
        cfg = dataclasses.replace(base, gab_impl_levels=levels)

        def fwd(p, s, xx, _cfg=cfg):
            return gastnet_forward(p, s, xx, _cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[27f {name} B={B}] {v:.0f} seq/s (compile {cs:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"[27f {name}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)


def err(seeds: int):
    cfg = dataclasses.replace(config_for_frames(FRAMES, dropout=0.0),
                              gab_impl_levels=("pallas_level", "", ""))
    exact = dataclasses.replace(cfg, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla",
                                gab_impl_levels=())

    @jax.jit
    def fwd(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]

    @jax.jit
    def fwd_exact(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    worst = 0.0
    for seed in range(seeds):
        params, state = init_gastnet(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (64, FRAMES, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd(params, state, x))
            - jax.device_get(fwd_exact(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [27f l0-fused] seed={seed}: {d*1000.0:.4f} mm", flush=True)
    print(f"[27f l0-fused] worst of {seeds} seeds: {worst:.4f} mm "
          f"({'WITHIN' if worst <= 0.1 else 'OVER'} 0.1mm budget)",
          flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--err-only", action="store_true")
    ap.add_argument("--speed-only", action="store_true")
    ap.add_argument("--deep", action="store_true")
    a = ap.parse_args()
    if not a.err_only:
        speed()
    if not a.speed_only:
        err(24 if a.deep else 8)


if __name__ == "__main__":
    main()
