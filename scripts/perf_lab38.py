"""Perf lab 38: the score/apply-block levers on the adopted routes.

perf_lab36 (r5) decomposed the adopted 243f kernels in-kernel and found
the per-head rank-1 SCORE DOTS are the largest removable term at the
pbatch levels (gab0 C=32, K'=32 effective heads: 53.5 ms of the 168.6 ms
stage = 32%; 2 tiny dots per effective head x 32). ``score_block``
collapses the 2K' rank-1 dots into TWO block-diagonal (K'*I, K') dots —
a 27f-measured NEGATIVE at K=8 (DESIGN.md "score-block"), but the
pbatch forms quadruple the head count, which is exactly the regime that
reverses the tradeoff. ``apply_block`` replaces each softmax group's G
per-head apply dots with one blocked dot (Mosaic-500 at K=8/TM=32 in r3;
the pbatch TM=16 tiles may clear the scoped-VMEM wall).

This lab measures the levers END-TO-END under the production defaults
(B=1024) and runs the lab29-style error cert (both levers regroup f32
accumulation trees — ~ulp, but adoption needs the 24-seed worst-case).

Reference for the attention being restructured:
model/global_attention.py:85-130 (per-head f = theta_k @ p_t +
(phi_k @ p_p)^T chains at every frame).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab38.py
       [--frames 243,81] [--combos base,sb,ab,sb-ab,fold] [--err-combo sb]
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

# (name, score_block, apply_block, kernel_form, form_levels)
COMBOS = (
    ("base", False, False, "v1", ()),   # == production
    ("sb", True, False, "v1", ()),
    ("ab", False, True, "v1", ()),
    ("sb-ab", True, True, "v1", ()),
    # r5 fold form: theta/phi projections + all 2K rank-1 score dots
    # pre-contracted into two thin (C, K) dots (fused_gab.py
    # _global_branch_fold) — removes the lab36 score-dot term entirely
    # instead of restructuring it like sb.
    ("fold", False, False, "fold", ()),
    # r5 per-level adoption shape: fold ONLY at the gab0 pbatch stage,
    # where the lab36 --form fold bisection measured it faster (157.5 vs
    # 168.6 ms at 243f K'=32); gab1 (K'=16) Mosaic-500s at the default
    # tile and LOSES at tb=2048, gab2/3 (K=8) lose outright.
    ("fold0", False, False, "v1", ("fold",)),
)


def _cfg(frames: int, sb: bool, ab: bool, form: str = "v1",
         form_levels=()):
    return dataclasses.replace(
        config_for_frames(frames, dropout=0.0),
        gab_score_block=sb, gab_apply_block=ab, gab_kernel_form=form,
        gab_kernel_form_levels=form_levels)


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


def speed(frames: int, combos):
    params, state = init_gastnet(
        jax.random.PRNGKey(0), config_for_frames(frames, dropout=0.0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, frames, 17, 2)).astype(np.float32))
    for name, sb, ab, form, fl in COMBOS:
        if name not in combos:
            continue
        cfg = _cfg(frames, sb, ab, form, fl)

        def fwd(p, s, xx, _cfg=cfg):
            return gastnet_forward(p, s, xx, _cfg, variant="dilated",
                                   train=False)[0]
        try:
            v, cs = _timed_scan(fwd, params, state, x)
            print(f"[{frames}f {name} B={B}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — Mosaic 500s land here
            print(f"[{frames}f {name}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


def err(frames: int, combo_name: str, seeds: int):
    _, sb, ab, form, fl = next(c for c in COMBOS if c[0] == combo_name)
    cfg = _cfg(frames, sb, ab, form, fl)
    exact = dataclasses.replace(
        cfg, matmul_precision="highest", precision_overrides=(),
        gab_impl="xla", gab_impl_levels=(), storage_dtype="float32",
        storage_dtype_levels=(), gab_score_block=False,
        gab_apply_block=False, gab_kernel_form="v1",
        gab_kernel_form_levels=())

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
              f"{d*1000.0:.4f} mm", flush=True)
    print(f"[{frames}f {combo_name}] worst of {seeds} seeds: "
          f"{worst:.4f} mm ({'WITHIN' if worst <= 0.1 else 'OVER'} "
          f"0.1mm budget)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", default="243,81")
    ap.add_argument("--combos", default="base,sb,ab,sb-ab")
    ap.add_argument("--err-combo", default="sb")
    ap.add_argument("--err-only", action="store_true")
    ap.add_argument("--speed-only", action="store_true")
    ap.add_argument("--deep", action="store_true",
                    help="24-seed error sweep (default 8)")
    a = ap.parse_args()
    combos = {c.strip() for c in a.combos.split(",") if c.strip()}
    seeds = 24 if a.deep else 8
    for f in [int(v) for v in a.frames.split(",") if v]:
        if not a.err_only:
            speed(f, combos)
        if not a.speed_only:
            err(f, a.err_combo, seeds)


if __name__ == "__main__":
    main()
