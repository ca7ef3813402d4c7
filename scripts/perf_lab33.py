"""Perf lab 33: pbatch kernel tuning sweep (VERDICT r3 item 2 follow-on).

The adopted frame-packed routing took 243f to 1,259 seq/s (perf_lab29);
the remaining knobs are the row-tile budget (gab_tile_budget — pbatch
auto-scales it by 8/K' beyond 8 effective heads, so the default 4096
lands at TM=16 for C=32/pack=4), the batched-softmax group width
(gab_softmax_group, adopted at 8 for the 27f kernels but never swept in
the pbatch form where K'=P*K heads change the chain shapes), and the
pack cap itself (gab_pbatch_max_pack=2 keeps TM=32 tiles at half lane
utilization). Sweep them end-to-end under the production route at
B=1024.

All combos are bitwise-identical programs modulo accumulation regroup
(same class as gab_score_block), so this is a speed-only sweep; the
adopted default's error tail is certified in perf_lab29/DESIGN.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab33.py
       [--frames 243] [--combos default,b8192,...]
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet

ITERS = 50
B = 1024

# (name, tile_budget, softmax_group, max_pack)
COMBOS = (
    ("default", 4096, 8, 0),       # == production (TM=16 at C=32/pack=4)
    ("b8192", 8192, 8, 0),         # TM=32 at pack=4 (the r4-bisect OOM
                                   # point was group=8 — re-probe)
    ("b8192-g4", 8192, 4, 0),      # TM=32, group=4 (compiled in bisect)
    ("g16", 4096, 16, 0),
    ("g4", 4096, 4, 0),
    ("pack2", 4096, 8, 2),         # P=2, classic TM=32 tiles
)


def _cfg(frames: int, budget: int, group: int, max_pack: int):
    return dataclasses.replace(
        config_for_frames(frames, dropout=0.0),
        gab_tile_budget=budget, gab_softmax_group=group,
        gab_pbatch_max_pack=max_pack)


def speed(frames: int, name: str, budget: int, group: int, max_pack: int):
    cfg = _cfg(frames, budget, group, max_pack)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (B, frames, 17, 2)).astype(np.float32))

    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            y = gastnet_forward(params, state, xx, cfg, variant="dilated",
                                train=False)[0]
            return jnp.max(jnp.abs(y)).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return out

    try:
        t0 = time.perf_counter()
        jax.device_get(many(params, state, x))
        cs = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — remote Mosaic 500s surface here
        print(f"[{frames}f {name} B={B}] COMPILE FAILED: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    print(f"[{frames}f {name} B={B}] {B * ITERS / dt:.0f} seq/s "
          f"(compile {cs:.0f}s)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=243)
    ap.add_argument("--combos", default=",".join(c[0] for c in COMBOS))
    a = ap.parse_args()
    want = {c.strip() for c in a.combos.split(",") if c.strip()}
    by_name = {c[0]: c for c in COMBOS}
    for name in [n for n in by_name if n in want]:
        _, budget, group, max_pack = by_name[name]
        speed(a.frames, name, budget, group, max_pack)


if __name__ == "__main__":
    main()
