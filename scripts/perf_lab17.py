"""Perf lab 17: kernel-path time attribution (27f production defaults).

perf_lab16 showed level fusion's traffic cut buys only +2.3% — the fused
path is compute/overhead-bound, not HBM-bound. This lab attributes the
~71 ms/iter (B=1024) across the pipeline's pieces by chain-scan timing
each kernel on its production-shaped input:

  * fused_gab   level0: (B, 25, 17, 128), 32-row tiles, 800 grid steps
  * fused_level level1: (B, 25, 17, 256) -> (B, 19, 17, 512), B steps
  * fused_gab_split level2 GAB: (B, 1, 17, 512), 2 kernels x 128 steps
  * XLA remainder: expand conv + level2 conv chain + shrink

and, per kernel, re-times with all-"default" tiers (1-pass dots) to
isolate the 3-pass "high" emulation cost from the structural cost
(VPU FMA loops, skinny score dots, softmax, grid overhead).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab17.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, graph_statics, init_gastnet
from gastx.models.gastnet import gastnet_forward

B = 1024


def _time_call(fn, x, iters=30):
    @jax.jit
    def many(x):
        def body(carry, _):
            # input must depend on the carry or XLA hoists the call out
            # of the scan as loop-invariant (measured: 3.19 "ms/iter"
            # for the full forward = one real call + 29 no-ops)
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            out = fn(xx)
            return out.ravel()[0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(x))
    dt = time.perf_counter() - t0
    return dt / iters * 1000.0, compile_s  # ms per call


def main():
    cfg = config_for_frames(27, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    rng = np.random.default_rng(0)

    from gastx.ops.pallas.fused_gab import (KERNEL_OPS, fused_gab,
                                            fused_gab_split)
    from gastx.ops.pallas.fused_level import LEVEL_OPS, fused_level
    from gastx.ops.pallas.precision import resolve_tiers

    def prec_for(tag):
        def p(op):
            v = cfg.precision_for(f"{tag}.{op}")
            return v if v is not None else cfg.precision_for(op)
        return p

    with jax.default_matmul_precision(cfg.matmul_precision):
        prod_tiers0 = resolve_tiers(prec_for("gab0"), KERNEL_OPS)
        prod_tiers2 = resolve_tiers(prec_for("gab2"), KERNEL_OPS)
        prod_tiers_lvl = (resolve_tiers(prec_for("lvl1"), LEVEL_OPS)
                          + resolve_tiers(prec_for("gab1"), KERNEL_OPS))
    dflt = tuple((op, "default") for op in KERNEL_OPS)
    dflt_lvl = tuple((op, "default") for op in LEVEL_OPS + KERNEL_OPS)

    # whole production forward for the denominator
    x_in = jnp.asarray(rng.standard_normal((B, 27, 17, 2)).astype(np.float32))

    def fwd(xx):
        return gastnet_forward(params, state, xx, cfg,
                               variant="dilated", train=False)[0]

    ms, cs = _time_call(fwd, x_in)
    print(f"[full forward] {ms:.2f} ms/iter (compile {cs:.0f}s) "
          f"= {B/ms*1000:.0f} seq/s", flush=True)

    x0 = jnp.asarray(rng.standard_normal((B, 25, 17, 128)).astype(np.float32))
    x1 = jnp.asarray(rng.standard_normal((B, 25, 17, 256)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((B, 1, 17, 512)).astype(np.float32))

    gp0, gs0 = params["gabs"][0], state["gabs"][0]
    tp1, ts1 = params["temporal"][0], state["temporal"][0]
    gp1, gs1 = params["gabs"][1], state["gabs"][1]
    gp2, gs2 = params["gabs"][2], state["gabs"][2]

    probes = [
        ("gab0 kernel (C=128, 800 steps)", lambda precs: _time_call(
            lambda xx: fused_gab(xx, gp0, gs0, sym, con, precs=precs,
                                 tile_budget=cfg.gab_tile_budget), x0),
         prod_tiers0, dflt),
        ("level1 fused (C=256, 1024 steps)", lambda precs: _time_call(
            lambda xx: fused_level(xx, tp1, ts1, gp1, gs1, sym, con,
                                   fw=3, dilation=3, res_off=3,
                                   precs=precs), x1),
         prod_tiers_lvl, dflt_lvl),
        ("gab2 split (C=512, 2x128 steps)", lambda precs: _time_call(
            lambda xx: fused_gab_split(xx, gp2, gs2, sym, con, precs=precs,
                                       tile_budget=cfg.gab_tile_budget), x2),
         prod_tiers2, dflt),
    ]
    for name, timer, prod_precs, dflt_precs in probes:
        with jax.default_matmul_precision(cfg.matmul_precision):
            ms_p, cs_p = timer(prod_precs)
            ms_d, cs_d = timer(dflt_precs)
        print(f"[{name}] prod tiers {ms_p:.2f} ms | all-default "
              f"{ms_d:.2f} ms (compiles {cs_p:.0f}/{cs_d:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
