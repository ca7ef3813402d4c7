"""Perf lab 41: gab_apply_block end-to-end at 27f, now that Mosaic takes it.

The blocked-apply restructuring (one (TM, G*J, J) @ (TM, J, G*g) dot per
softmax group instead of G per-head apply dots; bitwise-identical, CI
interpret test since r3) was deterministically HTTP-500'd by the remote
Mosaic service in r3 (perf_lab22) and again at the 243f/81f stage shapes
in r5 (perf_lab38). The r5 once-per-round probe (scripts/probe_blocked.py,
probe 3) now COMPILES it — the service image moved. lab36's stage
decomposition prices the per-head apply dots as the single largest
in-kernel term (~155 ms route-wide at 243f), and lab20 priced ~8 ms of
score+apply at 27f, so this is the first structural in-kernel lever to
unblock since the fold form.

Measures base vs ab (gab_apply_block=True) end-to-end at B=1024 under the
production defaults for --frames 27 (level-fused kernels) and asserts the
winner is bitwise-identical to base on-chip (block extraction reorders no
arithmetic; a mismatch means a kernel bug, not a tolerance question).

Reference for the apply being blocked: model/global_attention.py:120-130
(per-head attention @ g matmuls).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab41.py
       [--frames 27] [--combos base,ab] [--iters 50] [--batch 1024]
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

COMBOS = (("base", False), ("ab", True))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=27)
    ap.add_argument("--combos", default="base,ab")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1024)
    a = ap.parse_args()
    want = {c.strip() for c in a.combos.split(",") if c.strip()}
    B = a.batch

    base_cfg = config_for_frames(a.frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), base_cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, a.frames, 17, 2)).astype(np.float32))
    xs = x[:64]

    outs = {}
    for name, ab in COMBOS:
        if name not in want:
            continue
        cfg = dataclasses.replace(base_cfg, gab_apply_block=ab)

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
