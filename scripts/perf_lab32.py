"""Perf lab 32: 81f per-level storage ablation (VERDICT r3 item 3).

The 81f bf16-storage default ships 0.0935mm worst of 24 seeds on a 0.1mm
budget (r4, perf_lab29 --deep). Before flipping the whole arch to f32
(+margin, -10% speed), find the tail-OWNING level: run the production
route (pb0-w123 kernels, bf16 storage) with exactly ONE level's storage
restored to f32 (storage_dtype_levels) and record the worst-of-8 error
per choice. Then measure the speed of the promising combos (f32 at the
tail level only) — late levels have tiny activations (T shrinks 3x per
level), so restoring f32 there should cost ~nothing.

Columns: "f3" = f32 at level 3 only, "f23" = levels 2+3, "all-bf16" /
"all-f32" anchors.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab32.py
       [--frames 81] [--err-only | --speed-only] [--deep] [--combos f3,f23]
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

# Production kernel routes (the lab29 winners, spelled explicitly so the
# route is pinned regardless of future "auto" changes).
ROUTES = {
    81: ("pallas_pbatch", "pallas", "pallas", "pallas"),
    243: ("pallas_pbatch", "pallas_pbatch", "pallas", "pallas", "pallas"),
}


def storage_levels(frames: int, combo: str):
    n = len(ROUTES[frames])
    if combo == "all-bf16":
        return ()
    if combo == "all-f32":
        return ("float32",) * n
    assert combo.startswith("f"), combo
    lv = [int(ch) for ch in combo[1:]]
    return tuple("float32" if i in lv else "" for i in range(n))


def _cfg(frames: int, combo: str):
    base = config_for_frames(frames, dropout=0.0)
    return dataclasses.replace(
        base, gab_impl_levels=ROUTES[frames],
        storage_dtype_levels=storage_levels(frames, combo),
        **({"storage_dtype": "float32"} if combo == "all-f32" else {}))


def err(frames: int, combo: str, seeds: int):
    cfg = _cfg(frames, combo)
    exact = dataclasses.replace(
        config_for_frames(frames, dropout=0.0),
        matmul_precision="highest", precision_overrides=(),
        gab_impl="xla", gab_impl_levels=(), storage_dtype="float32")

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
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd(params, state, x))
            - jax.device_get(fwd_exact(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f {combo}] seed={seed}: {d*1000.0:.4f} mm",
              flush=True)
    print(f"[{frames}f {combo}] worst of {seeds} seeds: {worst:.4f} mm "
          f"({'WITHIN' if worst <= 0.1 else 'OVER'} 0.1mm budget)",
          flush=True)


def speed(frames: int, combo: str):
    cfg = _cfg(frames, combo)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, frames, 17, 2)).astype(np.float32))

    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            y = gastnet_forward(params, state, xx, cfg, variant="dilated",
                                train=False)[0]
            return jnp.max(jnp.abs(y)).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    print(f"[{frames}f {combo} B={B}] {B * ITERS / dt:.0f} seq/s "
          f"(compile {cs:.0f}s)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--combos", default="f0,f1,f2,f3,all-bf16")
    ap.add_argument("--err-only", action="store_true")
    ap.add_argument("--speed-only", action="store_true")
    ap.add_argument("--deep", action="store_true")
    a = ap.parse_args()
    seeds = 24 if a.deep else 8
    for combo in [c.strip() for c in a.combos.split(",") if c.strip()]:
        if not a.speed_only:
            err(a.frames, combo, seeds)
        if not a.err_only:
            speed(a.frames, combo)


if __name__ == "__main__":
    main()
