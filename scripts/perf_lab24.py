"""Perf lab 24: block-diagonal score dots (gab_score_block) on-chip.

perf_lab20 attributed ~8.3 ms of gab0's cost to the score+apply dots;
the apply half is Mosaic-blocked (perf_lab22), leaving the 2K rank-1
score dots — K 1-lane-in-128 output slivers per projection. The v2 form
already proved the block-diagonal replacement compiles and runs
(perf_lab18), but bundled it with slower roll-based local branches.
``gab_score_block`` lifts just the score-dot batching into the v1 body.

NOT bitwise: the interleaved zero slots regroup the f32 accumulation
tree (1-2 ulp on scores), so adoption needs its own error sweep.

Measures, production 27f defaults otherwise:
  1. worst |delta| vs XLA-"highest" over seeds with score_block=True
     (budget 0.1 mm) — use --deep for the 24-seed certification;
  2. B=1024 production-route seq/s A/B (off vs on);
  3. 81f/243f f32-kernel routing re-match with score_block on (lab23
     measured 4,233 / 1,085 seq/s without, vs bf16-XLA 4,316 / 1,133).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab24.py
       [--deep] [--skip-frames] [--skip-27]
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
BATCHES = {27: 1024, 81: 1024, 243: 256}


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


def make_fwd(cfg):
    @jax.jit
    def f(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]
    return f


def run_27(seeds):
    base = dataclasses.replace(config_for_frames(27, dropout=0.0),
                               storage_dtype="float32")
    sb = dataclasses.replace(base, gab_score_block=True)
    exact = dataclasses.replace(base, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla")
    fwd_exact = make_fwd(exact)
    fwd_sb = make_fwd(sb)

    worst = 0.0
    try:
        for seed in range(seeds):
            p, s = init_gastnet(jax.random.PRNGKey(seed), base)
            r = np.random.default_rng(seed)
            x = jnp.asarray(r.standard_normal(
                (64, 27, 17, 2)).astype(np.float32))
            d = float(jnp.max(jnp.abs(
                jax.device_get(fwd_sb(p, s, x))
                - jax.device_get(fwd_exact(p, s, x)))))
            worst = max(worst, d * 1000.0)
            print(f"  [score_block] seed={seed}: {d*1000.0:.4f} mm",
                  flush=True)
        verdict = "WITHIN" if worst <= 0.1 else "OVER"
        print(f"[27f score_block] worst of {seeds}: {worst:.4f} mm "
              f"({verdict} 0.1mm budget)", flush=True)
    except Exception as exc:
        print(f"[27f score_block err] FAILED: {type(exc).__name__}: "
              f"{str(exc)[:300]}", flush=True)
        return

    p, s = init_gastnet(jax.random.PRNGKey(0), base)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, 27, 17, 2)).astype(np.float32))
    for label, cfg in (("off", base), ("on", sb)):
        try:
            v, cs = _timed_scan(make_fwd(cfg), p, s, x)
            print(f"[27f score_block={label} B={B}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[27f score_block={label}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


def run_frames():
    for frames in (81, 243):
        b = BATCHES[frames]
        base = config_for_frames(frames, dropout=0.0)
        cfg = dataclasses.replace(base, storage_dtype="float32",
                                  gab_impl="pallas_level",
                                  gab_score_block=True)
        p, s = init_gastnet(jax.random.PRNGKey(0), cfg)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal(
            (b, frames, 17, 2)).astype(np.float32))
        try:
            v, cs = _timed_scan(make_fwd(cfg), p, s, x)
            print(f"[{frames}f f32-kernels+score_block B={b}] {v:.0f} "
                  f"seq/s (compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[{frames}f f32-kernels+score_block] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    seeds = 24 if "--deep" in sys.argv else 8
    if "--skip-27" not in sys.argv:
        run_27(seeds)
    if "--skip-frames" not in sys.argv:
        run_frames()
