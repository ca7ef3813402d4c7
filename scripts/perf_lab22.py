"""Perf lab 22: blocked apply dots in the fused GAB kernels.

After the batched softmax chains (perf_lab21, adopted: gab0 32.4 ->
24.7 ms), the remaining per-head work in the global branch is the 16
rank-1 score dots and the 8 batched apply dots (~8.3 ms together,
perf_lab20). ``gab_apply_block=True`` merges each softmax group's G
apply dots into ONE blocked (TM, G*J, J) @ (TM, J, G*g_ch) dot and
extracts the diagonal (J, g_ch) blocks — bitwise-identical per block
(CI-verified), and since the per-head dots pad g_ch=16 -> 128 lanes,
the blocked form's off-diagonal volume is mostly already being paid.

Measures on-chip:
  1. gab0 kernel (C=128, B=1024, T=25) ms with/without apply_block;
  2. bitwise check on the production route;
  3. full 27f production forward seq/s with apply_block.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab22.py
"""
from __future__ import annotations

import dataclasses
import functools
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
    for blk in (False, True):
        fn = functools.partial(fused_gab, params=gp0, state=gs0,
                               sym_idx=sym, con_idx=con, precs=precs,
                               softmax_group=cfg.gab_softmax_group,
                               apply_block=blk)
        try:
            with jax.default_matmul_precision(cfg.matmul_precision):
                ms, cs = _timed(lambda xx: fn(xx), x0)
                outs[blk] = jax.device_get(fn(x0[:8]))
            print(f"[gab0 apply_block={blk}] {ms:.2f} ms (compile {cs:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"[gab0 apply_block={blk}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    if len(outs) == 2:
        print(f"[bitwise] max|d| = "
              f"{float(np.max(np.abs(outs[True] - outs[False])))}",
              flush=True)

    pcfg = dataclasses.replace(cfg, gab_apply_block=True)

    @jax.jit
    def fwd(p, s, xx):
        return gastnet_forward(p, s, xx, pcfg, variant="dilated",
                               train=False)[0]
    xb = jnp.asarray(rng.standard_normal((B, 27, 17, 2)).astype(np.float32))
    try:
        ms, cs = _timed(lambda xx: fwd(params, state, xx), xb)
        print(f"[27f prod apply_block B={B}] {B / ms * 1000:.0f} seq/s "
              f"({ms:.2f} ms/iter, compile {cs:.0f}s)", flush=True)
    except Exception as exc:
        print(f"[27f prod apply_block] FAILED: {type(exc).__name__}: "
              f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
