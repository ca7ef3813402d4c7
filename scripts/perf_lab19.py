"""Perf lab 19: 2-pass conv tiers in the level-fused kernel.

perf_lab17 showed level1's kernel costs 34.2 ms at production tiers vs
26.8 ms all-"default" — the 3-pass "high" emulation of its conv-chain
dots (temporal x3 taps + mid1x1, plus the gab "high" dots) is the one
non-structural cost left at 27f. The kernel-only 2-pass tiers
("high_lhs" = exact activations/bf16 weights, "high_rhs" = exact
weights/bf16 activations; gastx/ops/pallas/precision.py) cut one MXU
pass per dot; measured CPU-side matmul error ~1.4e-3 relative — between
"default" (~3e-3 on TPU) and "high" (4e-6).

Measures on-chip at 27f, production defaults otherwise:
  1. worst |delta| vs XLA-"highest" over seeds for temporal+mid1x1 at
     each of {high_rhs, high_lhs} (budget 0.1 mm);
  2. B=1024 production-route seq/s for whichever tier(s) pass.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab19.py
       [--deep] [--form v1|v2] [--ops temporal,mid1x1,...]
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
    seeds = 24 if "--deep" in sys.argv else 8
    form = "v1"
    if "--form" in sys.argv:
        form = sys.argv[sys.argv.index("--form") + 1]
    ops = ("temporal", "mid1x1")
    if "--ops" in sys.argv:
        ops = tuple(sys.argv[sys.argv.index("--ops") + 1].split(","))

    base = dataclasses.replace(config_for_frames(27, dropout=0.0),
                               storage_dtype="float32",
                               gab_kernel_form=form)
    exact = dataclasses.replace(base, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla")

    def with_tier(tier):
        # Strip any existing override for `ops`, then pin them to `tier`.
        kept = tuple((o, t) for o, t in base.precision_overrides
                     if o not in ops)
        return dataclasses.replace(
            base, precision_overrides=kept + tuple((o, tier) for o in ops))

    def make_fwd(cfg):
        @jax.jit
        def f(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        return f

    fwd_exact = make_fwd(exact)

    for tier in ("high_rhs", "high_lhs"):
        cfg = with_tier(tier)
        fwd = make_fwd(cfg)
        worst = 0.0
        try:
            for seed in range(seeds):
                p, s = init_gastnet(jax.random.PRNGKey(seed), base)
                r = np.random.default_rng(seed)
                x = jnp.asarray(r.standard_normal(
                    (64, 27, 17, 2)).astype(np.float32))
                d = float(jnp.max(jnp.abs(
                    jax.device_get(fwd(p, s, x))
                    - jax.device_get(fwd_exact(p, s, x)))))
                worst = max(worst, d * 1000.0)
                print(f"  [{tier}] seed={seed}: {d*1000.0:.4f} mm",
                      flush=True)
            verdict = "WITHIN" if worst <= 0.1 else "OVER"
            print(f"[{','.join(ops)}@{tier} form={form}] worst of {seeds}: "
                  f"{worst:.4f} mm ({verdict} 0.1mm budget)", flush=True)
            if worst > 0.1:
                continue
        except Exception as exc:
            print(f"[{tier}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
            continue

        p, s = init_gastnet(jax.random.PRNGKey(0), base)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal(
            (B, 27, 17, 2)).astype(np.float32))
        v, cs = _timed_scan(fwd, p, s, x)
        print(f"[{tier} form={form} B={B}] {v:.0f} seq/s "
              f"(compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
