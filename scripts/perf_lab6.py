"""Perf lab 6: does the TPU_MIXED inference preset stay within the 0.1mm
budget at 81 and 243 frames?

The 0.093mm/8-seed measurement behind the original TPU_MIXED preset
(gastx/models/config.py; superseded r3c — perf_lab13 deepened it to 24
seeds, found a 0.1088mm tail, and promoted attn_cat to "high") was taken
on the 27f/ch128 architecture, but
config_for_frames applies the preset to the 81f/ch64 and 243f/ch32
architectures too. Precision tiers are CPU no-ops, so only an on-chip
measurement can validate those. Error metric matches perf_lab2/3: max
per-joint |delta| vs the same-weights all-"highest" forward (which is
itself <=2e-5 of the torch reference).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab6.py
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

SEEDS = 4
BATCH = 64


def max_err_mm(frames: int) -> float:
    mixed = config_for_frames(frames, dropout=0.0)
    exact = dataclasses.replace(mixed, matmul_precision="highest",
                                precision_overrides=())

    # Hoisted jits: shapes/configs are constant across seeds, so each
    # forward compiles ONCE per frame count (fresh per-seed lambdas would
    # miss the jit cache and recompile 1-5 min every iteration).
    @jax.jit
    def fwd_mixed(p, s, xx):
        return gastnet_forward(p, s, xx, mixed, variant="dilated",
                               train=False)[0]

    @jax.jit
    def fwd_exact(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    worst = 0.0
    for seed in range(SEEDS):
        params, state = init_gastnet(jax.random.PRNGKey(seed), mixed)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal(
            (BATCH, frames, 17, 2)).astype(np.float32))
        y_m = fwd_mixed(params, state, x)
        y_e = fwd_exact(params, state, x)
        d = float(jnp.max(jnp.abs(jax.device_get(y_m) - jax.device_get(y_e))))
        worst = max(worst, d * 1000.0)
        print(f"  frames={frames} seed={seed}: {d*1000.0:.4f} mm", flush=True)
    return worst


def main():
    for frames in (81, 243):
        w = max_err_mm(frames)
        verdict = "WITHIN" if w <= 0.1 else "OVER"
        print(f"[{frames}f] worst of {SEEDS} seeds: {w:.4f} mm -> "
              f"{verdict} 0.1mm budget", flush=True)


if __name__ == "__main__":
    main()
