"""Perf lab 26: component attribution of the 243f bf16-XLA forward.

perf_lab25 re-confirmed the shipped attn/local einsum layouts at
81/243f; this lab asks where the 243f production forward's ~0.9 ms/seq
actually goes, before any deeper restructuring is attempted. Times each
stage standalone (chain-scan, one sync) on its production shapes in
bf16, plus the whole forward and the XLA cost-analysis roofline terms
(isolated-component sums overestimate vs the fused whole — DESIGN.md
notes the same caveat for lab17 — but the *distribution* is the
actionable output).

Stages at 243f dilated (B, 243, 17, 2), channels 32:
  expand    (B,243,17,2)  -> (B,241,17,32)   conv fw=3 d=1 + BN + ReLU
  gab{i}    (B,T_i,17,C_i) -> 2*C_i           T = 241,235,217,163,1
  lvl{i}    conv d=3^i + BN + ReLU + 1x1 + BN + ReLU + residual
  shrink    (B,1,17,1024) -> (B,1,17,3)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab26.py
       [--frames 243] [--batch 512]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.config import graph_statics, xla_precision
from gastx.models.precision import cast_floating
from gastx.ops.graph import graph_attention_block
from gastx.ops.temporal import pointwise, temporal_conv
from gastx.ops.batchnorm import batch_norm

ITERS = 20


def _timed_scan(fn, *args, iters=ITERS):
    @jax.jit
    def many(*a):
        def body(carry, _):
            # keep the perturbation in the input's dtype (a f32 carry
            # would silently promote bf16 stage inputs to f32)
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
    return dt / iters * 1e3, compile_s  # ms/iter


def main():
    frames = 243
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    b = 512
    if "--batch" in sys.argv:
        b = int(sys.argv[sys.argv.index("--batch") + 1])

    cfg = config_for_frames(frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    pb, sb = cast_floating(params, jnp.bfloat16), cast_floating(
        state, jnp.bfloat16)
    statics = graph_statics(cfg.layout)
    fw = cfg.filter_widths
    r = np.random.default_rng(0)

    def prec(tag):
        def p(op):
            v = cfg.precision_for(f"{tag}.{op}")
            if v is None:
                v = cfg.precision_for(op)
            if v is None:
                v = cfg.matmul_precision
            return xla_precision(v)
        return p

    # ---- whole forward (the production route: storage auto -> bf16) ----
    x = jnp.asarray(r.standard_normal(
        (b, frames, 17, 2)).astype(np.float32))

    def full(p, s, xx):
        return gastnet_forward(p, s, xx, cfg, variant="dilated",
                               train=False)[0]
    ms, cs = _timed_scan(full, params, state, x)
    total = ms
    print(f"[{frames}f B={b} full] {ms:.2f} ms/iter "
          f"({b*1000/ms:.0f} seq/s; compile {cs:.0f}s)", flush=True)

    # ---- per-stage ----
    t = frames
    stages = []
    # expand: conv + bn + relu
    t_out = t - (fw[0] - 1)
    c = cfg.channels

    def expand(p, s, xx):
        y = temporal_conv(xx.astype(jnp.bfloat16), p["expand_conv"]["w"],
                          precision=prec("")("expand"))
        y, _ = batch_norm(y, p["expand_bn"], s["expand_bn"], train=False)
        return jax.nn.relu(y)
    stages.append(("expand", expand, (pb, sb), (b, t, 17, 2)))

    dil = 1
    for i in range(cfg.num_levels):
        ci = cfg.block_channels(i)
        ti = t - sum((fw[k] - 1) * (3 ** k) for k in range(i + 1))

        def gab(p, s, xx, _i=i):
            return graph_attention_block(
                xx, p["gabs"][_i], s["gabs"][_i], statics, train=False,
                dropout_rate=0.0, rng=None, attn_impl=cfg.attn_impl,
                local_impl=cfg.local_impl, gab_impl="xla",
                prec=prec(f"gab{_i}"))[0]
        stages.append((f"gab{i} C={ci} T={ti}", gab, (pb, sb),
                       (b, ti, 17, ci)))

        if i + 1 < cfg.num_levels:
            cn = cfg.block_channels(i + 1)
            d = 3 ** (i + 1)
            tn = ti - (fw[i + 1] - 1) * d

            def lvl(p, s, xx, _i=i, _d=d):
                blk_p, blk_s = p["temporal"][_i], s["temporal"][_i]
                lp = prec(f"lvl{_i+1}")
                pad = (fw[_i + 1] - 1) * _d // 2
                res = xx[:, pad: xx.shape[1] - pad]
                z = temporal_conv(xx, blk_p["conv_t"]["w"], dilation=_d,
                                  precision=lp("temporal"))
                z, _ = batch_norm(z, blk_p["bn_t"], blk_s["bn_t"],
                                  train=False)
                z = jax.nn.relu(z)
                z = pointwise(z, blk_p["conv_1"]["w"],
                              precision=lp("mid1x1"))
                z, _ = batch_norm(z, blk_p["bn_1"], blk_s["bn_1"],
                                  train=False)
                return res + jax.nn.relu(z)
            stages.append((f"lvl{i+1} C={cn} T={ti}->{tn}", lvl, (pb, sb),
                           (b, ti, 17, cn)))
        dil *= 3

    def shrink(p, s, xx):
        return pointwise(xx, p["shrink"]["w"],
                         precision=prec("")("shrink"))
    stages.append(("shrink", shrink, (pb, sb),
                   (b, 1, 17, cfg.out_channels)))

    acc = 0.0
    for name, fn, pargs, shape in stages:
        xx = jnp.asarray(r.standard_normal(shape).astype(np.float32)
                         ).astype(jnp.bfloat16)
        try:
            ms, cs = _timed_scan(fn, *pargs, xx)
        except Exception as exc:
            print(f"  {name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
            continue
        acc += ms
        print(f"  {name}: {ms:.2f} ms ({100*ms/total:.0f}% of full; "
              f"compile {cs:.0f}s)", flush=True)
    print(f"[sum of stages] {acc:.2f} ms vs full {total:.2f} ms "
          f"(isolated-overestimate factor {acc/total:.2f}x)", flush=True)

    # ---- roofline terms of the full forward ----
    lowered = jax.jit(full).lower(params, state, x).compile()
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    fl = float(ca.get("flops", float("nan")))
    by = float(ca.get("bytes accessed", float("nan")))
    print(f"[cost analysis] {fl/b/1e9:.3f} GFLOP/seq, "
          f"{by/b/1e6:.2f} MB/seq; at {b*1000/total:.0f} seq/s -> "
          f"{by/b*(b*1000/total)/1e9:.0f} GB/s, "
          f"{fl/b*(b*1000/total)/1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
