"""Perf lab 21: batched per-head softmax chains in the fused GAB kernels.

perf_lab20's in-kernel ablation attributed 8.1 of gab0's 32.4 ms to the
8 per-head LeakyReLU/softmax/+C_k chains — 7-op VPU chains on 128-lane-
padded (TM, 17, 17) slivers, i.e. per-op dispatch overhead, not math.
``softmax_group=G`` (GastNetConfig.gab_softmax_group) concatenates G
heads' score tensors along the sublane axis and runs ONE chain per
group; bitwise-identical math (interpret-verified 0.0 delta).

Measures on-chip:
  1. gab0 kernel (C=128, B=1024, T=25) ms/iter at G in {1, 2, 4, 8};
  2. on-chip bitwise check G=8 vs G=1 on the production route;
  3. full 27f production forward seq/s at the best G.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab21.py
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import (config_for_frames, gastnet_forward, graph_statics,
                          init_gastnet)
from gastx.ops.pallas.fused_gab import KERNEL_OPS, fused_gab
from gastx.ops.pallas.precision import resolve_tiers

B = 1024


def _timed(fn, *args, iters=30):
    @jax.jit
    def many(x, *rest):
        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            return fn(xx, *rest).ravel()[0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(*args))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(*args))
    return (time.perf_counter() - t0) / iters * 1000.0, cs


def main():
    groups = (1, 2, 4, 8)
    if "--groups" in sys.argv:
        groups = tuple(int(g) for g in
                       sys.argv[sys.argv.index("--groups") + 1].split(","))
    cfg = config_for_frames(27, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)

    def p0(op):
        v = cfg.precision_for(f"gab0.{op}")
        return v if v is not None else cfg.precision_for(op)

    with jax.default_matmul_precision(cfg.matmul_precision):
        precs = resolve_tiers(p0, KERNEL_OPS)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, 25, 17, 128)).astype(np.float32))
    gp0, gs0 = params["gabs"][0], state["gabs"][0]

    outs = {}
    for g in groups:
        fn = functools.partial(fused_gab, params=gp0, state=gs0,
                               sym_idx=sym, con_idx=con, precs=precs,
                               softmax_group=g)
        try:
            with jax.default_matmul_precision(cfg.matmul_precision):
                ms, cs = _timed(lambda xx: fn(xx), x0)
                outs[g] = jax.device_get(fn(x0[:8]))
            print(f"[gab0 G={g}] {ms:.2f} ms (compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[gab0 G={g}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    if 1 in outs:
        for g in sorted(outs):
            if g == 1:
                continue
            d = float(np.max(np.abs(outs[g] - outs[1])))
            print(f"[bitwise G={g} vs G=1] max|d| = {d}", flush=True)

    # Full production forward at the sweep's best measured group.
    for g in ([int(sys.argv[sys.argv.index("--full") + 1])]
              if "--full" in sys.argv else [8]):
        pcfg = dataclasses.replace(cfg, gab_softmax_group=g)

        @jax.jit
        def fwd(p, s, xx):
            return gastnet_forward(p, s, xx, pcfg, variant="dilated",
                                   train=False)[0]
        xb = jnp.asarray(rng.standard_normal(
            (B, 27, 17, 2)).astype(np.float32))
        try:
            ms, cs = _timed(lambda xx: fwd(params, state, xx), xb)
            print(f"[27f prod G={g} B={B}] {B / ms * 1000:.0f} seq/s "
                  f"({ms:.2f} ms/iter, compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[27f prod G={g}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
