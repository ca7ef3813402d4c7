"""Perf lab 39: refreshed 27f stage attribution + priced ceiling.

The shipped 27f route (20.1k seq/s after the r4 level-0 fusion) has no
per-kernel ms table — lab17/lab20 predate softmax grouping, the 2-pass
conv tiers, and fused level 0 (VERDICT r4 weak #6). This lab times the
production units exactly as gastnet._forward dispatches them:

  l0      fused_level0 kernel: [init_bn -> expand -> BN -> ReLU -> GAB0]
          on the raw (B, 27, 17, 2) input -> (B, 25, 17, 256)
  l1      fused_level kernel: [dilated conv chain + GAB1] at C=256,
          (B, 25, 17, 256) -> (B, 19, 17, 512)
  l2conv  XLA conv chain at C=512 (dilated conv -> BN -> ReLU -> 1x1 ->
          BN -> ReLU -> +res), (B, 19, 17, 512) -> (B, 1, 17, 512)
  gab2    split-pair kernels at C=512 (T=1), -> (B, 1, 17, 1024)
  shrink  1x1 (1024 -> 3)
  total   gastnet_forward production (the anchor)

glue = total - stage sum; ceiling = B / (total - gab-stage time) prices
the non-GAB floor the 243f lab34 arithmetic produced (VERDICT item 4).
Knob sweep (--combos): softmax_group 16 and tile_budget 8192 end-to-end
on the shipped bodies (both untouched since the group=8 / 4096 defaults
were set on the PRE-level-fusion kernels).

Reference for the architecture: model/gast_net.py:139-176 at the
27-frame config (reconstruction.py:220-228).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab39.py
       [--stages l0,l1,l2conv,gab2,shrink,total] [--combos g16,b8192]
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.config import graph_statics, xla_precision
from gastx.ops.graph import graph_attention_block
from gastx.ops.temporal import pointwise, temporal_conv

ITERS = 50
B = 1024
FRAMES = 27


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


def _prec(cfg, tag):
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


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stages", default="l0,l1,l2conv,gab2,shrink,total")
    ap.add_argument("--combos", default="")
    a = ap.parse_args()
    want = {s.strip() for s in a.stages.split(",") if s.strip()}
    combos = {s.strip() for s in a.combos.split(",") if s.strip()}

    from gastx.ops.pallas.fused_gab import KERNEL_OPS
    from gastx.ops.pallas.fused_level import (LEVEL_OPS, fused_level,
                                              fused_level0)
    from gastx.ops.pallas.precision import resolve_tiers

    cfg = config_for_frames(FRAMES, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    fw = cfg.filter_widths
    pads, shifts = cfg.pads(), cfg.causal_shifts("dilated")
    r = np.random.default_rng(0)
    c0 = cfg.channels                      # 128
    x_raw = jnp.asarray(r.standard_normal(
        (B, FRAMES, 17, 2)).astype(np.float32))
    rows = []

    def mm():
        return jax.default_matmul_precision(cfg.matmul_precision)

    def row(name, ms, cs):
        rows.append((name, ms))
        print(f"[{name}] {ms:.2f} ms (compile {cs:.0f}s)", flush=True)

    if "l0" in want:
        raw0 = _prec(cfg, "lvl0").kernel_raw

        def l0(p, s, xx):
            return fused_level0(
                xx, p, s, sym, con, fw=fw[0],
                precs=((("temporal", raw0("expand") or "high"),)
                       + resolve_tiers(_prec(cfg, "gab0"), KERNEL_OPS)),
                softmax_group=cfg.gab_softmax_group,
                apply_block=cfg.gab_apply_block,
                score_block=cfg.gab_score_block)
        with mm():
            ms, cs = _timed_scan(l0, params, state, x_raw)
        row("l0 fused_level0 (raw 2ch -> 25x17x256)", ms, cs)

    if "l1" in want:
        x1 = jnp.asarray(r.standard_normal(
            (B, FRAMES - fw[0] + 1, 17, 2 * c0)).astype(np.float32))

        def l1(p, s, xx):
            return fused_level(
                xx, p["temporal"][0], s["temporal"][0],
                p["gabs"][1], s["gabs"][1], sym, con,
                fw=fw[1], dilation=fw[0], res_off=pads[1] + shifts[1],
                precs=(resolve_tiers(_prec(cfg, "lvl1"), LEVEL_OPS)
                       + resolve_tiers(_prec(cfg, "gab1"), KERNEL_OPS)),
                softmax_group=cfg.gab_softmax_group,
                apply_block=cfg.gab_apply_block,
                score_block=cfg.gab_score_block)
        with mm():
            ms, cs = _timed_scan(l1, params, state, x1)
        row("l1 fused_level (C=256 -> 19x17x512)", ms, cs)

    t2 = FRAMES - fw[0] + 1 - (fw[1] - 1) * fw[0]      # 19
    dil2 = fw[0] * fw[1]                               # 9
    if "l2conv" in want:
        x2 = jnp.asarray(r.standard_normal(
            (B, t2, 17, 4 * c0)).astype(np.float32))

        def l2conv(p, _s, xx):
            bp = p["temporal"][1]
            lp = _prec(cfg, "lvl2")
            res = xx[:, pads[2] + shifts[2]: xx.shape[1] - pads[2]
                     + shifts[2]]
            z = temporal_conv(xx, bp["conv_t"]["w"], dilation=dil2,
                              precision=lp("temporal"))
            z = jax.nn.relu(z)  # BN folds to affine at eval; ~free
            z = pointwise(z, bp["conv_1"]["w"], precision=lp("mid1x1"))
            z = jax.nn.relu(z)
            return res + z
        with mm():
            ms, cs = _timed_scan(l2conv, params, state, x2)
        row("l2conv XLA chain (C=512, T=19 -> 1)", ms, cs)

    if "gab2" in want:
        xg = jnp.asarray(r.standard_normal(
            (B, 1, 17, 4 * c0)).astype(np.float32))

        def gab2(p, s, xx):
            return graph_attention_block(
                xx, p["gabs"][2], s["gabs"][2], statics, train=False,
                dropout_rate=0.0, rng=None, gab_impl="pallas",
                gab_tile_budget=cfg.gab_tile_budget,
                gab_softmax_group=cfg.gab_softmax_group,
                gab_pbatch_max_pack=cfg.gab_pbatch_max_pack,
                prec=_prec(cfg, "gab2"))[0]
        with mm():
            ms, cs = _timed_scan(gab2, params, state, xg)
        row("gab2 split pair (C=512, T=1)", ms, cs)

    if "shrink" in want:
        xs = jnp.asarray(r.standard_normal(
            (B, 1, 17, 8 * c0)).astype(np.float32))

        def shrink(p, _s, xx):
            return pointwise(xx, p["shrink"]["w"],
                             precision=_prec(cfg, "shrink")("shrink"))
        with mm():
            ms, cs = _timed_scan(shrink, params, state, xs)
        row("shrink (1024 -> 3)", ms, cs)

    if "total" in want:
        def full(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        ms, cs = _timed_scan(full, params, state, x_raw)
        row("total (production)", ms, cs)
        print(f"  = {B * 1000 / ms:.0f} seq/s", flush=True)
        stage_sum = sum(m for n, m in rows if n != "total (production)")
        if stage_sum:
            print(f"  stage sum {stage_sum:.2f} ms; glue "
                  f"{ms - stage_sum:+.2f} ms", flush=True)
            nongab = sum(m for n, m in rows
                         if n.startswith(("l2conv", "shrink")))
            glue = ms - stage_sum
            print(f"  non-GAB floor (l2conv + shrink + glue) = "
                  f"{nongab + glue:.2f} ms -> ceiling "
                  f"{B * 1000 / max(nongab + glue, 1e-9):.0f} seq/s",
                  flush=True)

    for name in ("g16", "b8192"):
        if name not in combos:
            continue
        cfg2 = dataclasses.replace(
            cfg, gab_softmax_group=16 if name == "g16"
            else cfg.gab_softmax_group,
            gab_tile_budget=8192 if name == "b8192"
            else cfg.gab_tile_budget)

        def full2(p, s, xx, _c=cfg2):
            return gastnet_forward(p, s, xx, _c, variant="dilated",
                                   train=False)[0]
        try:
            ms, cs = _timed_scan(full2, params, state, x_raw)
            print(f"[combo {name}] {ms:.2f} ms = {B * 1000 / ms:.0f} seq/s "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — Mosaic 500s land here
            print(f"[combo {name}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
