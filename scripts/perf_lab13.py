"""Perf lab 13: the mixed-preset error TAIL at 24 seeds (27f).

A 24-seed probe (2026-08-17) showed the 8-seed error figures were
tail-lucky: the production 27f mixed preset measures worst 0.1088 mm
(fused kernels) / 0.1065 mm (XLA) vs the all-"highest" reference — both
just OVER the 0.1 mm budget, both at seed 17. The kernels are not the
outlier; the TPU_MIXED_PRECISION_OVERRIDES tier mix itself carries the
tail.

OUTCOME (adopted, 2026-08-17): candidate 1 (attn_cat->"high" — the
historical MIXED_SAFE set) won the canary decisively (worst-2-seeds
0.1088 -> 0.0463 mm; the other promotions left <=0.0935, too thin) and
re-certified at 0.0631 mm worst of 24 seeds / 14,074 seq/s e2e (-2.5%)
through the production fused-kernel path. TPU_MIXED_PRECISION_OVERRIDES
now ships without attn_cat, so candidate 0 ("incumbent") reproduces the
new default and candidate 1 is a no-op; the pre-adoption figures above
came from the 6-op preset this file was written against.

This lab finds the cheapest single-op promotion that restores margin:

  --canary: for each candidate promotion, the error on the two worst
      seeds (17, 23) through the production kernel path — one compile +
      two forwards each, so the sweep stays cheap.
  --full IDX: 24-seed error + B=1024 e2e throughput for candidate IDX
      (run for the canary winner before adopting).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab13.py --canary
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.config import TPU_MIXED_PRECISION_OVERRIDES

# Candidate promotions: ops currently at "default" in the mixed preset,
# grouped the way perf_lab2/3 measured them.
CANDIDATES = (
    ("mixed (incumbent)", ()),
    ("attn_cat->high (MIXED_SAFE)", ("attn_cat",)),
    ("local_cat->high", ("local_cat",)),
    ("attn_score+apply->high", ("attn_score", "attn_apply")),
    ("local_sem+off->high", ("local_sem", "local_off")),
)


def _cfg(promote, gab_impl=None):
    overrides = tuple((op, tier) for op, tier in
                      TPU_MIXED_PRECISION_OVERRIDES if op not in promote)
    cfg = dataclasses.replace(config_for_frames(27, dropout=0.0),
                              precision_overrides=overrides)
    if gab_impl is not None:
        cfg = dataclasses.replace(cfg, gab_impl=gab_impl)
    return cfg


def _err(cfg, exact, seeds):
    @jax.jit
    def fwd_p(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]

    @jax.jit
    def fwd_e(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    worst = 0.0
    for seed in seeds:
        params, state = init_gastnet(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((64, 27, 17, 2)).astype(
            np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd_p(params, state, x))
            - jax.device_get(fwd_e(params, state, x))))) * 1000.0
        worst = max(worst, d)
        print(f"    seed={seed}: {d:.4f} mm", flush=True)
    return worst


def _exact_cfg():
    return dataclasses.replace(
        config_for_frames(27, dropout=0.0), matmul_precision="highest",
        precision_overrides=(), gab_impl="xla", storage_dtype="float32")


def canary():
    exact = _exact_cfg()
    for name, promote in CANDIDATES:
        print(f"[{name}]", flush=True)
        t0 = time.perf_counter()
        worst = _err(_cfg(promote), exact, (17, 23))
        print(f"[{name}] canary worst {worst:.4f} mm "
              f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)


def full(idx: int, gab_impl=None):
    name, promote = CANDIDATES[idx]
    if gab_impl is not None:
        name = f"{name} gab={gab_impl}"
    cfg = _cfg(promote, gab_impl)
    print(f"[{name}] 24-seed error:", flush=True)
    worst = _err(cfg, _exact_cfg(), range(24))
    print(f"[{name}] worst of 24 seeds: {worst:.4f} mm "
          f"({'WITHIN' if worst <= 0.1 else 'OVER'} budget)", flush=True)

    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    batch, iters = 1024, 30

    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * 1e-12
            y, _ = gastnet_forward(params, state, xx, cfg,
                                   variant="dilated", train=False)
            return y.sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 27, 17, 2)).astype(
        np.float32))
    jax.device_get(many(params, state, x))
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    print(f"[{name}] e2e {batch * iters / dt:.0f} seq/s", flush=True)


if __name__ == "__main__":
    if "--full" in sys.argv:
        full(int(sys.argv[sys.argv.index("--full") + 1]),
             "xla" if "--xla" in sys.argv else None)
    else:
        canary()
