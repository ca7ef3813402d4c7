"""Perf lab 40: the last untouched 81f knob — softmax_group on the
shipped route.

perf_lab34/37 --frames 81 (r5, DESIGN.md "81f route attribution") found
the same flat per-level dispatch bound as 243f and measured every
structural lever rejected (sb/ab Mosaic-500 end-to-end, fold has no
winning level, level fusion VMEM-gated at T=73/55). The one knob never
measured at 81f's head counts is ``gab_softmax_group`` (default 8,
adopted at 27f in perf_lab21 where grouping is bitwise-identical;
group=16 tied at 27f in perf_lab39 but on K'=32-free bodies). 81f runs
K'=16 at the pbatch level and K=8 at the per-GAB levels, so group=16
batches 2 full head sets per chain there.

Measures base / g16 / g4 end-to-end at B=1024 under the production 81f
defaults and asserts the winner is bitwise-identical to base on-chip
(grouping reorders no arithmetic; a mismatch means a kernel bug, not a
tolerance question).

Reference for the softmax being grouped: model/local_attention.py:40-42
and model/global_attention.py:74-78 (per-head masked softmax rows).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab40.py
       [--frames 81] [--combos base,g16,g4] [--iters 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

B = 1024

COMBOS = (("base", 8), ("g16", 16), ("g4", 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--combos", default="base,g16,g4")
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    want = {c.strip() for c in a.combos.split(",") if c.strip()}

    base_cfg = config_for_frames(a.frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), base_cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, a.frames, 17, 2)).astype(np.float32))
    xs = x[:64]

    outs = {}
    for name, group in COMBOS:
        if name not in want:
            continue
        cfg = dataclasses.replace(base_cfg, gab_softmax_group=group)

        def fwd(p, s, xx, _cfg=cfg):
            return gastnet_forward(p, s, xx, _cfg, variant="dilated",
                                   train=False)[0]

        @jax.jit
        def many(p, s, xx, _fwd=fwd, _n=a.iters):
            def body(carry, _):
                xi = xx + carry * jnp.asarray(1e-12, xx.dtype)
                return _fwd(p, s, xi).sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=_n)
            return out

        try:
            t0 = time.perf_counter()
            jax.device_get(many(params, state, x))
            cs = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.device_get(many(params, state, x))
            v = B * a.iters / (time.perf_counter() - t0)
            outs[name] = jax.device_get(
                jax.jit(fwd)(params, state, xs))
            print(f"[{a.frames}f {name} B={B}] {v:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — Mosaic 500s land here
            print(f"[{a.frames}f {name}] FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)

    if "base" in outs:
        for name in outs:
            if name == "base":
                continue
            same = bool(np.array_equal(outs["base"], outs[name]))
            print(f"[{a.frames}f {name}] bitwise == base: {same}",
                  flush=True)


if __name__ == "__main__":
    main()
