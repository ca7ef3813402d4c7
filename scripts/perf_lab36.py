"""Perf lab 36: ablation attribution INSIDE the adopted 243f kernels.

perf_lab34 showed the adopted 243f route's per-level GAB cost is FLAT
(169-191 ms across a 64x FLOP range) — the bound is per-row attention-
chain structure, not channel math. perf_lab20 attributed the ORIGINAL
27f gab0 kernel (pre softmax-grouping, C=128, K=8); this lab re-runs the
same surgical-removal methodology on the kernels the 243f route actually
ships: the frame-packed pbatch kernels at C=32/64 (K' = P*K = 32/16
effective heads, softmax_group=8) and the per-GAB whole-block kernels at
C=128/256 — under the production precision tiers (incl. the r4 1-pass
attn_proj/attn_cat/gab_cat adoptions, perf_lab35).

Ablations (each keeps shapes + dataflow; numerically wrong on purpose;
production `ablate=""` compiles the identical jaxpr):

  full        — the production kernel (reference point)
  no_locloop  — local aggregation = h0 * wself only (no neighbor FMAs)
  no_softmax  — attn = leaky(f) + ck (skip max/exp/sum/div)
  no_scores   — f = theta-slice broadcast (skip the 2/head score dots)
  no_apply    — gy = gx (skips scores+softmax+apply dotg, like lab20:
                the whole per-head loop; theta/phi dots DCE away)
  no_global   — global branch = relu(x) stub (projections + cat gone too)
  no_local    — local branch = relu(x) stub

Reading the deltas: chains = full - no_softmax; score dots = no_softmax -
... (nested removals overlap, so compare each against full and against
the branch stubs, as lab20/DESIGN.md did).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab36.py
       [--stages gab1,gab2] [--ablates full,no_softmax,...] [--frames 243]
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, init_gastnet
from gastx.models.config import graph_statics, xla_precision
from gastx.ops.pallas.fused_gab import (KERNEL_OPS, fused_gab,
                                        fused_gab_pbatch)
from gastx.ops.pallas.precision import resolve_tiers

ITERS = 20
B = 1024

# (level, gab_input_T, gab_input_C, production impl), keyed by frame count
# (r4 advisor fix: the table must match --frames or every stage feeds the
# wrong shapes). 243f = the adopted pb01-w234 route; 81f = pb0-w123 (its
# C=512 gab3 is the T=1 split-pair sliver, 0.5% of the route — omitted,
# fused_gab_split has no ablate hooks).
GABS_BY_FRAMES = {
    243: {
        "gab0": (0, 241, 32, "pbatch"),
        "gab1": (1, 235, 64, "pbatch"),
        "gab2": (2, 217, 128, "pallas"),
        "gab3": (3, 163, 256, "pallas"),
    },
    81: {
        "gab0": (0, 79, 64, "pbatch"),
        "gab1": (1, 73, 128, "pallas"),
        "gab2": (2, 55, 256, "pallas"),
    },
}

ABLATES = ("full", "no_softmax", "no_scores", "no_apply", "no_global",
           "no_local", "no_locloop")


def _timed_scan(fn, x, iters=ITERS):
    @jax.jit
    def many(x):
        def body(carry, _):
            eps = carry.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
            out = fn(x + eps)
            return jnp.sum(out.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(x))
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
    ap.add_argument("--frames", type=int, default=243,
                    choices=sorted(GABS_BY_FRAMES))
    ap.add_argument("--stages", default="gab1,gab2")
    ap.add_argument("--ablates", default=",".join(ABLATES))
    ap.add_argument("--score-block", action="store_true",
                    help="run every combo with gab_score_block=True")
    ap.add_argument("--apply-block", action="store_true",
                    help="run every combo with gab_apply_block=True "
                         "(r3 Mosaic-500 probe at K=8; K=4 here)")
    ap.add_argument("--form", default="v1", choices=("v1", "v2", "fold"),
                    help="kernel form for every combo (fold = r5 "
                         "score-folded global branch)")
    ap.add_argument("--tile-budget", type=int, default=0,
                    help="override cfg.gab_tile_budget (scoped-VMEM "
                         "probe; pbatch auto-scales it by 8/K')")
    a = ap.parse_args()
    stages = [s.strip() for s in a.stages.split(",") if s.strip()]
    ablates = [s.strip() for s in a.ablates.split(",") if s.strip()]

    cfg = config_for_frames(a.frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    bf16 = jnp.bfloat16
    r = np.random.default_rng(0)

    gabs = GABS_BY_FRAMES[a.frames]
    for stage in stages:
        i, t, c, impl = gabs[stage]
        gp, gs = params["gabs"][i], state["gabs"][i]
        with jax.default_matmul_precision(cfg.matmul_precision):
            precs = resolve_tiers(_prec(cfg, f"gab{i}"), KERNEL_OPS)
        x = jnp.asarray(
            r.standard_normal((B, t, 17, c)).astype(np.float32)).astype(bf16)
        base_ms = None
        for ab in ablates:
            ab_arg = "" if ab == "full" else ab

            def gab(xx, _ab=ab_arg, _impl=impl, _c=c):
                kw = dict(precs=precs,
                          tile_budget=a.tile_budget or cfg.gab_tile_budget,
                          softmax_group=cfg.gab_softmax_group, ablate=_ab,
                          form=a.form, score_block=a.score_block,
                          apply_block=a.apply_block)
                if _impl == "pbatch":
                    return fused_gab_pbatch(xx, gp, gs, sym, con,
                                            pack=128 // _c, **kw)
                return fused_gab(xx, gp, gs, sym, con, **kw)
            try:
                with jax.default_matmul_precision(cfg.matmul_precision):
                    ms, cs = _timed_scan(gab, x)
                if ab == "full":
                    base_ms = ms
                saved = (f" (saves {base_ms - ms:+.2f} ms)"
                         if base_ms is not None and ab != "full" else "")
                print(f"[{stage} C={c} {impl} {ab}] {ms:.2f} ms{saved} "
                      f"(compile {cs:.0f}s)", flush=True)
            except Exception as exc:  # noqa: BLE001 — Mosaic 500s land here
                print(f"[{stage} C={c} {impl} {ab}] FAILED: "
                      f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
