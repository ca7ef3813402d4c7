"""Perf lab 35: precision-tier loosening on the narrow archs (243f/81f).

The adopted r4 routes ship large error headroom: 243f pb01-w234 measures
0.0261 mm worst of 8 seeds and 81f pb0-w123(+f32 tail) 0.0747 mm worst
of 24 against the 0.1 mm budget. Inside the kernels the remaining
"high"-tier dots (attn_proj, attn_cat, gab_cat — the mixed preset keeps
them 3-pass) cost 3 MXU passes each, and perf_lab31/26 attribution says
the kernel path is compute/dispatch-bound — so each tier dropped to
"default" (1-pass) removes real MXU time. This lab spends part of the
error headroom on speed, per level (the level-qualified override
"gab{i}.attn_proj" lands only in that level's kernel):

  kdef-all   attn_proj/attn_cat/gab_cat -> "default" at every level
  kdef-01    ... only at the pbatch levels (243f: C=32/64)
  kdef-0123  ... everywhere but the C=512 tail level
  k2p-all    ... -> "high_lhs" (2-pass, activations exact) everywhere

plus one routing probe:

  xla4       the C=512 T=1 tail level (17-row sliver, two kernel
             launches in the split pair) routed back to XLA

Speed end-to-end at B=1024 under the production defaults; the error
sweep (worst over seeds vs the all-"highest" f32 XLA reference, the
perf_lab29 method) certifies any winner before adoption.

Reference for the architectures being tuned: model/gast_net.py:139-176
at the 243/81-frame configs (reconstruction.py:220-228, gen_skes.py:43).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab35.py
       [--frames 243,81] [--combos kdef-all,xla4] [--err-combo NAME]
       [--err-only | --speed-only] [--deep]
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

_KOPS = ("attn_proj", "attn_cat", "gab_cat")


def _over(levels, tier):
    """Level-qualified override pairs for the 3 remaining "high" kernel
    dots; levels=None means the bare (all-levels) op classes."""
    if levels is None:
        return tuple((op, tier) for op in _KOPS)
    return tuple((f"gab{i}.{op}", tier)
                 for i in levels for op in _KOPS)


def _combos(frames: int):
    n = 5 if frames == 243 else 4
    combos = [
        ("base", (), None, 0),
        ("kdef-all", _over(None, "default"), None, 0),
        ("kdef-01" if frames == 243 else "kdef-0",
         _over(range(2) if frames == 243 else range(1), "default"), None, 0),
        (f"kdef-0{n - 2}", _over(range(n - 1), "default"), None, 0),
        ("k2p-all", _over(None, "high_lhs"), None, 0),
        # 1-pass tiers also remove the per-dot bf16-split temporaries
        # (ah/al/bh/bl) from the scoped-VMEM stack — re-probe the TM=32
        # tile that Mosaic-OOM'd at the 3-pass tiers (perf_lab33 b8192).
        ("kdef-b8192", _over(None, "default"), None, 8192),
    ]
    # Tail-level routing probe: the production "auto" route spelled out
    # per level (bf16 -> pbatch below C=128, per-GAB kernels above —
    # gastx/ops/graph.py auto branch) with the last level back on XLA
    # (its activations are a (B, 1, 17, 512) sliver; the split pair pays
    # two kernel launches for 17 rows of work).
    pb = "pallas_pbatch"
    tail_xla = ((pb, pb, "pallas", "pallas", "xla") if frames == 243
                else (pb, "pallas", "pallas", "xla"))
    combos.append((f"xla{n - 1}", (), tail_xla, 0))
    return combos


def _cfg(frames: int, extra_overrides, impl_levels, budget=0):
    cfg = config_for_frames(frames, dropout=0.0)
    # Post-adoption, config_for_frames(243) already prepends the three
    # kdefault loosening pairs — strip any bare _KOPS entries so "base"
    # keeps its documented meaning (3-pass kernels, the 1,259 seq/s /
    # 0.0261 mm pre-adoption route) and kdef-all doesn't double-prepend
    # (r4 advisor finding). Combo overrides are re-applied below.
    cfg = dataclasses.replace(
        cfg, precision_overrides=tuple(
            p for p in cfg.precision_overrides if p[0] not in _KOPS))
    if budget:
        cfg = dataclasses.replace(cfg, gab_tile_budget=budget)
    if extra_overrides:
        # Level-qualified pairs take priority via level_prec's first-match
        # lookup only when they precede the bare class — prepend.
        cfg = dataclasses.replace(
            cfg, precision_overrides=extra_overrides
            + cfg.precision_overrides)
    if impl_levels is not None:
        cfg = dataclasses.replace(cfg, gab_impl_levels=impl_levels)
    return cfg


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


def speed(frames: int, want):
    base = config_for_frames(frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, frames, 17, 2)).astype(np.float32))
    for name, overrides, impls, budget in _combos(frames):
        if want and name not in want:
            continue
        cfg = _cfg(frames, overrides, impls, budget)

        def fwd(p, s, xx, _cfg=cfg):
            return gastnet_forward(p, s, xx, _cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f {name} B={B}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — remote Mosaic 500s
            print(f"[{frames}f {name}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)


def err(frames: int, combo_name: str, seeds: int):
    by_name = {n: (o, i, bud) for n, o, i, bud in _combos(frames)}
    overrides, impls, budget = by_name[combo_name]
    cfg = _cfg(frames, overrides, impls, budget)
    exact = dataclasses.replace(
        cfg, matmul_precision="highest", precision_overrides=(),
        gab_impl="xla", gab_impl_levels=(), storage_dtype="float32",
        storage_dtype_levels=())

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
        print(f"  [{frames}f {combo_name}] seed={seed}: "
              f"{d * 1000.0:.4f} mm", flush=True)
    print(f"[{frames}f {combo_name}] worst of {seeds} seeds: "
          f"{worst:.4f} mm ({'WITHIN' if worst <= 0.1 else 'OVER'} "
          f"0.1mm budget)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", default="243")
    ap.add_argument("--combos", default="")
    ap.add_argument("--err-combo", default="")
    ap.add_argument("--err-only", action="store_true")
    ap.add_argument("--speed-only", action="store_true")
    ap.add_argument("--deep", action="store_true",
                    help="24-seed error sweep (default 8)")
    a = ap.parse_args()
    want = {s.strip() for s in a.combos.split(",") if s.strip()}
    for f in (int(s) for s in a.frames.split(",")):
        if not a.err_only:
            speed(f, want)
        if not a.speed_only and a.err_combo:
            err(f, a.err_combo, 24 if a.deep else 8)


if __name__ == "__main__":
    main()
