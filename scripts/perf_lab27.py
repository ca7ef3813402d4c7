"""Perf lab 27: can the f32 fused-GAB kernels beat bf16-XLA per level at
243f, and does a bigger batch lift the 43%-HBM utilization?

perf_lab26's attribution: the 243f bf16-XLA forward is ~95% GAB time
(convs 1-5%/level), runs at 43% HBM peak / ~6% MFU — neither roofline
term binds, so the cost is XLA's attention-chain structure. The full-path
f32-kernel route nearly ties bf16-XLA (1,085 vs 1,133 seq/s, perf_lab23)
while paying 2x I/O bytes at the narrow levels; per-LEVEL the picture
may invert where C >= 128 (f32 kernel I/O is unpadded (B,T*J,C) while
bf16-XLA pays the 17->32 sublane pad, and the kernel removes all
interior attention materialization). If the wide-level kernels win
per-stage, a hybrid route (bf16-XLA narrow levels, f32 kernels wide)
could beat both measured full paths.

Measures on-chip at 243f shapes, B=512:
  1. fused-GAB kernel (f32, production tiers) per gab0-3 stage vs the
     lab26 bf16-XLA stage times;
  2. full-path bf16-XLA seq/s at B={1024, 2048} (243f) and B=2048 (81f)
     — batch scaling of the 43%-HBM program.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab27.py
       [--stage-only | --batch-only]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.config import graph_statics, xla_precision
from gastx.ops.graph import graph_attention_block

ITERS = 20
B = 512


def _timed_scan(fn, *args, iters=ITERS):
    @jax.jit
    def many(*a):
        def body(carry, _):
            eps = carry.astype(a[-1].dtype) * jnp.asarray(1e-6, a[-1].dtype)
            out = fn(*a[:-1], a[-1] + eps)
            return jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(*args))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, compile_s


def stage_probe():
    cfg = config_for_frames(243, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    r = np.random.default_rng(0)

    def prec(tag):
        def p(op):
            v = cfg.precision_for(f"{tag}.{op}")
            if v is None:
                v = cfg.precision_for(op)
            if v is None:
                v = cfg.matmul_precision
            return xla_precision(v)

        def raw(op):
            v = cfg.precision_for(f"{tag}.{op}")
            return v if v is not None else cfg.precision_for(op)
        p.kernel_raw = raw
        return p

    shapes = [(0, 241, 32), (1, 235, 64), (2, 217, 128), (3, 163, 256)]
    for i, t, c in shapes:
        x = jnp.asarray(r.standard_normal((B, t, 17, c)).astype(np.float32))

        def gab(p, s, xx, _i=i):
            return graph_attention_block(
                xx, p["gabs"][_i], s["gabs"][_i], statics, train=False,
                dropout_rate=0.0, rng=None, gab_impl="pallas",
                gab_tile_budget=cfg.gab_tile_budget,
                gab_softmax_group=cfg.gab_softmax_group,
                prec=prec(f"gab{_i}"))[0]
        try:
            ms, cs = _timed_scan(gab, params, state, x)
            print(f"  gab{i} C={c} T={t} f32-kernel: {ms:.2f} ms "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:
            print(f"  gab{i} C={c} f32-kernel FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)


def batch_probe():
    for frames, batches in ((243, (1024, 2048)), (81, (2048,))):
        cfg = config_for_frames(frames, dropout=0.0)
        params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
        r = np.random.default_rng(0)

        def full(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        for b in batches:
            x = jnp.asarray(r.standard_normal(
                (b, frames, 17, 2)).astype(np.float32))
            try:
                ms, cs = _timed_scan(full, params, state, x)
                print(f"[{frames}f bf16 B={b}] {b*1000/ms:.0f} seq/s "
                      f"({ms:.1f} ms/iter; compile {cs:.0f}s)", flush=True)
            except Exception as exc:
                print(f"[{frames}f B={b}] FAILED: {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)


def main():
    if "--batch-only" not in sys.argv:
        stage_probe()
    if "--stage-only" not in sys.argv:
        batch_probe()


if __name__ == "__main__":
    main()
