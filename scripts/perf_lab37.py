"""Perf lab 37: IN-SITU decomposition of the adopted 243f route + the glue.

perf_lab34 attributed the adopted 243f route by timing each stage in
ISOLATION: stage sum 738.6 ms vs measured total 813.7 ms left ~75 ms (9.2%)
of unattributed "glue/casts" (VERDICT r4 weak #3). Isolated stages can't see
boundary costs — the pbatch pack/unpack transposes, the custom-call layout
materialization XLA must do around every pallas_call, per-iteration kernel
weight prep (``_pbatch_tree`` kron/blockdiag chains, ``_ensure_f32`` casts,
BN folds), and the bf16 storage casts. This lab measures the route the way
it actually runs:

  total      gastnet_forward, production defaults (sanity anchor)
  route      this lab's replica of the production eval route (must match
             total — everything below is a surgery on this replica)
  prefix k   route truncated after GAB k -> marginal IN-SITU per-level
             cost (glue attaches to the level that owns it)
  nogab      every GAB replaced by a shape-preserving stub (concat[y, y])
             -> the non-GAB floor including real inter-stage glue
  noconv     every interior conv chain replaced by the residual center
             slice -> the GAB chain including glue
  skeleton   both stubs -> expand + shrink + slicing/cast skeleton
  packrt     the pbatch pack/unpack transposes alone (optimization_barrier
             stands in for the kernel's fusion-breaking custom call)
  prep       full route with params perturbed per scan iteration (defeats
             XLA while-loop invariant code motion) vs x perturbed ->
             the per-iteration kernel weight-prep cost that LICM hoists
             in the chained-scan benchmarks but real per-call dispatch pays

Reading: glue_total = route - (sum of lab34/36-style isolated stages);
per-level glue = prefix-marginal(k) - isolated(k). Reference for the level
chain whose boundaries this decomposes: model/gast_net.py:159-176 at the
243-frame config (reconstruction.py:220-228).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab37.py
       [--frames 243] [--parts total,route,prefixes,stubs,packrt,prep]
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.config import graph_statics, xla_precision
from gastx.models.precision import cast_floating
from gastx.ops.batchnorm import batch_norm
from gastx.ops.graph import graph_attention_block
from gastx.ops.temporal import pointwise, temporal_conv

ITERS = 20
B = 1024


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


def _timed(fn, *args, iters=ITERS, perturb="x"):
    """Chained-scan timing; ``perturb`` controls which input the loop body
    perturbs (the perturbed one cannot be hoisted out of the while loop)."""
    @jax.jit
    def many(params, x):
        def body(carry, _):
            if perturb == "params":
                p = jax.tree_util.tree_map(
                    lambda a: a + carry.astype(a.dtype)
                    * jnp.asarray(1e-9, a.dtype), params)
                out = fn(p, x)
            else:
                eps = carry.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                out = fn(params, x + eps)
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


def build_route(cfg, state, statics):
    """The production eval route as an explicit function of (params, x),
    with per-level stub switches. Mirrors gastnet._forward's uniform-bf16
    eval path (243f/81f production); `upto=k` truncates after GAB k."""
    fw = cfg.filter_widths
    pads, shifts = cfg.pads(), cfg.causal_shifts("dilated")

    def route(p, x, *, upto=None, gab_stub=False, conv_stub=False):
        s = cast_floating(state, x.dtype)
        y = batch_norm(x, p["init_bn"], s["init_bn"], train=False)[0]
        y = temporal_conv(y, p["expand_conv"]["w"],
                          precision=_prec(cfg, "lvl0")("expand"))
        y = batch_norm(y, p["expand_bn"], s["expand_bn"], train=False)[0]
        y = jax.nn.relu(y)
        next_dilation = 1

        for i in range(cfg.num_levels):
            if i > 0:
                blk_p, blk_s = p["temporal"][i - 1], s["temporal"][i - 1]
                lp = _prec(cfg, f"lvl{i}")
                pad, shift = pads[i], shifts[i]
                res = y[:, pad + shift: y.shape[1] - pad + shift]
                if conv_stub:
                    y = res
                else:
                    z = temporal_conv(y, blk_p["conv_t"]["w"],
                                      dilation=next_dilation,
                                      precision=lp("temporal"))
                    z = batch_norm(z, blk_p["bn_t"], blk_s["bn_t"],
                                   train=False)[0]
                    z = jax.nn.relu(z)
                    z = pointwise(z, blk_p["conv_1"]["w"],
                                  precision=lp("mid1x1"))
                    z = batch_norm(z, blk_p["bn_1"], blk_s["bn_1"],
                                   train=False)[0]
                    y = res + jax.nn.relu(z)
            if gab_stub:
                y = jnp.concatenate([y, y * jnp.asarray(0.5, y.dtype)],
                                    axis=-1)
            else:
                y = graph_attention_block(
                    y, p["gabs"][i], s["gabs"][i], statics, train=False,
                    dropout_rate=0.0, rng=None,
                    gab_impl=cfg.gab_impl_for(i),
                    gab_tile_budget=cfg.gab_tile_budget,
                    gab_softmax_group=cfg.gab_softmax_group,
                    gab_pbatch_max_pack=cfg.gab_pbatch_max_pack,
                    prec=_prec(cfg, f"gab{i}"))[0]
            next_dilation = fw[0] if i == 0 else next_dilation * fw[i]
            if upto == i:
                return y
        return pointwise(y, p["shrink"]["w"],
                         precision=_prec(cfg, "shrink")("shrink"))
    return route


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=243, choices=(81, 243))
    ap.add_argument("--parts",
                    default="total,route,prefixes,stubs,packrt,prep")
    a = ap.parse_args()
    want = {w.strip() for w in a.parts.split(",") if w.strip()}

    cfg = config_for_frames(a.frames, dropout=0.0)
    if a.frames == 81:
        # The lab replica models the uniform-bf16 route; drop the f32 tail
        # level so route == production modulo that one documented cast.
        import dataclasses
        cfg = dataclasses.replace(cfg, storage_dtype_levels=())
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    bf16 = jnp.bfloat16
    params_b = cast_floating(params, bf16)
    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(rng.standard_normal(
        (B, a.frames, 17, 2)).astype(np.float32))
    x_b = x_raw.astype(bf16)
    route = build_route(cfg, state, statics)
    def mm():
        return jax.default_matmul_precision(cfg.matmul_precision)

    def row(name, ms, cs, base=None):
        extra = f"  (= {B * 1000 / ms:.0f} seq/s)" if base is None else \
            f"  (marginal {ms - base:+.2f} ms)"
        print(f"[{name}] {ms:.2f} ms{extra} (compile {cs:.0f}s)", flush=True)
        return ms

    if "total" in want:
        def full(p, x):
            return gastnet_forward(p, state, x, cfg, variant="dilated",
                                   train=False)[0]
        ms, cs = _timed(full, params, x_raw)
        row("total: gastnet_forward production", ms, cs)

    if "route" in want:
        with mm():
            ms, cs = _timed(lambda p, x: route(p, x), params_b, x_b)
        row("route: lab replica (must ~= total)", ms, cs)

    if "prefixes" in want:
        prev = 0.0
        for k in range(cfg.num_levels):
            with mm():
                ms, cs = _timed(
                    lambda p, x, _k=k: route(p, x, upto=_k), params_b, x_b)
            row(f"prefix gab0..gab{k}", ms, cs, base=prev if k else None)
            prev = ms

    if "stubs" in want:
        for name, kw in (("nogab", dict(gab_stub=True)),
                         ("noconv", dict(conv_stub=True)),
                         ("skeleton", dict(gab_stub=True, conv_stub=True))):
            with mm():
                ms, cs = _timed(
                    lambda p, x, _kw=kw: route(p, x, **_kw), params_b, x_b)
            row(name, ms, cs)

    if "packrt" in want:
        # The pbatch pack/unpack transposes at the narrow levels' real
        # shapes, with an optimization_barrier standing in for the
        # fusion-breaking pallas custom call between them.
        t_of = {243: (241, 235), 81: (79,)}[a.frames]
        c0 = cfg.channels
        for li, t in enumerate(t_of):
            c = c0 * (2 ** li)
            pack = 128 // c
            if pack <= 1:
                continue
            xg = jnp.asarray(rng.standard_normal(
                (B, t, 17, c)).astype(np.float32)).astype(bf16)

            def packrt(_p, xx, _pack=pack, _t=t, _c=c):
                m0 = B * _t
                g = m0 // _pack
                xp = xx.reshape(g, _pack, 17, _c).transpose(0, 2, 1, 3) \
                    .reshape(g, 1, 17, _pack * _c)
                xp = jax.lax.optimization_barrier(xp)
                # unpack at the kernel's 2C output width stand-in: reuse C
                y = xp.reshape(g, 17, _pack, _c).transpose(0, 2, 1, 3)
                return y.reshape(B, _t, 17, _c)
            with mm():
                ms, cs = _timed(packrt, params_b, xg)
            row(f"packrt gab{li} (C={c}, pack={pack})", ms, cs)

    if "prep" in want:
        with mm():
            ms_x, cs_x = _timed(lambda p, x: route(p, x), params_b, x_b,
                                perturb="x")
            ms_p, cs_p = _timed(lambda p, x: route(p, x), params_b, x_b,
                                perturb="params")
        row("prep: x-perturb (LICM hoists weight prep)", ms_x, cs_x)
        row("prep: param-perturb (weight prep in-loop)", ms_p, cs_p)
        print(f"[prep] per-iteration kernel weight-prep cost ~= "
              f"{ms_p - ms_x:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
