"""Perf lab 18: v2 kernel form on-chip (restructured fused-GAB compute).

perf_lab17 attributed the 27f kernel path's ~71 ms/iter and showed the
per-GAB kernel cost is structural — per-joint VPU FMA loops, 16 rank-1
score dots, grid overhead — not precision emulation (gab0 retimed
all-"default" within 0.4 ms of production tiers). The v2 bodies
(gastx/ops/pallas/fused_gab.py, GastNetConfig.gab_kernel_form) merge the
local sem-conv dots into one (C, 4C) dot, turn the J*D per-joint FMAs
into ~O(distinct shifts) full-tensor sublane rolls, merge theta/phi/g
into one wide dot, and collapse the 2K rank-1 score dots into two
block-diagonal dots. Same math to f32 roundoff (interpret-verified).

Measures on-chip at --frames {27,81,243} (default 27), B=1024:
  1. production-default forward (gab_impl="auto" -> level-fused route)
     v1 vs v2 seq/s;
  2. per-kernel chain-scan A/B on production shapes (27f only);
  3. worst |delta| vs the same-weights XLA-"highest" forward over seeds
     for the v2 route (budget 0.1 mm; 8 seeds, 24 with --deep).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab18.py
       [--frames N] [--deep] [--err-only | --time-only | --no-kernels]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import (config_for_frames, gastnet_forward, graph_statics,
                          init_gastnet)

B = 1024


def _timed_scan(fn, *args, iters=30):
    """args[-1] must be the input the iteration perturbs."""
    @jax.jit
    def many(*a):
        x = a[-1]

        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            out = fn(*a[:-1], xx) if len(a) > 1 else fn(xx)
            return out.ravel()[0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(*args))
    dt = time.perf_counter() - t0
    return dt / iters * 1000.0, compile_s  # ms per call


def main():
    deep = "--deep" in sys.argv
    seeds = 24 if deep else 8
    frames = 27
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    prod = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                               storage_dtype="float32")
    v2 = dataclasses.replace(prod, gab_kernel_form="v2")
    exact = dataclasses.replace(prod, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla")

    def make_fwd(cfg):
        @jax.jit
        def f(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        return f

    fwd_v1, fwd_v2, fwd_exact = map(make_fwd, (prod, v2, exact))
    params, state = init_gastnet(jax.random.PRNGKey(0), prod)
    rng = np.random.default_rng(0)

    if "--err-only" not in sys.argv:
        x = jnp.asarray(rng.standard_normal(
            (B, frames, 17, 2)).astype(np.float32))
        for name, fwd in (("v1 prod", fwd_v1), ("v2", fwd_v2)):
            try:
                ms, cs = _timed_scan(
                    lambda p, s, xx: fwd(p, s, xx), params, state, x)
                print(f"[{frames}f {name} B={B}] {B/ms*1000:.0f} seq/s "
                      f"({ms:.2f} ms/iter, compile {cs:.0f}s)", flush=True)
            except Exception as exc:
                print(f"[{frames}f {name}] FAILED: {type(exc).__name__}: "
                      f"{str(exc)[:300]}", flush=True)

    if frames == 27 and not ({"--err-only", "--no-kernels"} & set(sys.argv)):
        # per-kernel A/B on the production shapes
        from gastx.ops.pallas.fused_gab import (KERNEL_OPS, fused_gab,
                                                fused_gab_split)
        from gastx.ops.pallas.fused_level import LEVEL_OPS, fused_level
        from gastx.ops.pallas.precision import resolve_tiers

        statics = graph_statics(prod.layout)
        sym = tuple(int(i) for i in statics.sym_idx)
        con = tuple(int(i) for i in statics.con_idx)

        def prec_for(tag):
            def p(op):
                vv = prod.precision_for(f"{tag}.{op}")
                return vv if vv is not None else prod.precision_for(op)
            return p

        with jax.default_matmul_precision(prod.matmul_precision):
            t0 = resolve_tiers(prec_for("gab0"), KERNEL_OPS)
            t2 = resolve_tiers(prec_for("gab2"), KERNEL_OPS)
            tl = (resolve_tiers(prec_for("lvl1"), LEVEL_OPS)
                  + resolve_tiers(prec_for("gab1"), KERNEL_OPS))

        x0 = jnp.asarray(rng.standard_normal(
            (B, 25, 17, 128)).astype(np.float32))
        x1 = jnp.asarray(rng.standard_normal(
            (B, 25, 17, 256)).astype(np.float32))
        x2 = jnp.asarray(rng.standard_normal(
            (B, 1, 17, 512)).astype(np.float32))
        gp0, gs0 = params["gabs"][0], state["gabs"][0]
        tp1, ts1 = params["temporal"][0], state["temporal"][0]
        gp1, gs1 = params["gabs"][1], state["gabs"][1]
        gp2, gs2 = params["gabs"][2], state["gabs"][2]

        probes = [
            ("gab0 C=128", lambda form: _timed_scan(
                lambda xx: fused_gab(xx, gp0, gs0, sym, con, precs=t0,
                                     tile_budget=prod.gab_tile_budget,
                                     form=form), x0)),
            ("level1 C=256", lambda form: _timed_scan(
                lambda xx: fused_level(xx, tp1, ts1, gp1, gs1, sym, con,
                                       fw=3, dilation=3, res_off=3,
                                       precs=tl, form=form), x1)),
            ("gab2 split C=512", lambda form: _timed_scan(
                lambda xx: fused_gab_split(xx, gp2, gs2, sym, con, precs=t2,
                                           tile_budget=prod.gab_tile_budget,
                                           form=form), x2)),
        ]
        for name, timer in probes:
            with jax.default_matmul_precision(prod.matmul_precision):
                try:
                    ms1, c1 = timer("v1")
                    ms2, c2 = timer("v2")
                    print(f"[{name}] v1 {ms1:.2f} ms | v2 {ms2:.2f} ms "
                          f"({ms1/ms2:.2f}x, compiles {c1:.0f}/{c2:.0f}s)",
                          flush=True)
                except Exception as exc:
                    print(f"[{name}] FAILED: {type(exc).__name__}: "
                          f"{str(exc)[:300]}", flush=True)

    if "--time-only" in sys.argv:
        return

    worst = 0.0
    for seed in range(seeds):
        p, s = init_gastnet(jax.random.PRNGKey(seed), prod)
        r = np.random.default_rng(seed)
        x = jnp.asarray(r.standard_normal(
            (64, frames, 17, 2)).astype(np.float32))
        d = float(jnp.max(jnp.abs(
            jax.device_get(fwd_v2(p, s, x))
            - jax.device_get(fwd_exact(p, s, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  [{frames}f v2] seed={seed}: {d*1000.0:.4f} mm", flush=True)
    print(f"[{frames}f v2] worst of {seeds} seeds: {worst:.4f} mm "
          f"({'WITHIN' if worst <= 0.1 else 'OVER'} 0.1mm budget)",
          flush=True)


if __name__ == "__main__":
    main()
