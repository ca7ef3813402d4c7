"""Perf lab 34: stage attribution of the ADOPTED r4 243f route.

perf_lab33 showed the pbatch knobs are at their optimum (g4/g16/pack2
within noise of the 1,260 seq/s default), so the next 243f lever must be
structural. This lab re-runs the lab26/27-style stage probe under the
production route itself — bf16 activations, pbatch kernels at the C=32/64
levels, per-GAB whole-block kernels at C=128/256 and the split pair at
C=512 — to see where the 0.79 ms/seq now goes:

  gab0  pbatch  C=32   T=241   (rows 4,097)
  gab1  pbatch  C=64   T=235   (rows 3,995)
  gab2  pallas  C=128  T=217   (rows 3,689)
  gab3  pallas  C=256  T=163   (rows 2,771)
  gab4  pallas  C=512  T=1     (rows 17, split pair)
  convs all-XLA lumped (expand + lvl1-4 chains + shrink)

Stage sums overestimate the fused total (isolated XLA stages lose
full-graph fusion; kernels don't), but the RATIOS say which level owns
the next optimization. Reference for the architecture being attributed:
model/gast_net.py:139-176 at the 243-frame config
(reconstruction.py:220-228).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab34.py
       [--frames 243] [--stages gab0,gab1,gab2,gab3,gab4,convs,total]
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import config_for_frames, gastnet_forward, init_gastnet
from gastx.models.config import graph_statics, xla_precision
from gastx.ops.graph import graph_attention_block
from gastx.ops.temporal import pointwise, temporal_conv

ITERS = 20
B = 1024

# (level, gab_input_T, gab_input_C, production impl), keyed by frame count.
# 243f = the adopted pb01-w234 route; 81f = pb0-w123 (VERDICT r4 weak #4:
# the 81f route never got this attribution).
GABS_BY_FRAMES = {
    243: [
        (0, 241, 32, "pallas_pbatch"),
        (1, 235, 64, "pallas_pbatch"),
        (2, 217, 128, "pallas"),
        (3, 163, 256, "pallas"),
        (4, 1, 512, "pallas"),
    ],
    81: [
        (0, 79, 64, "pallas_pbatch"),
        (1, 73, 128, "pallas"),
        (2, 55, 256, "pallas"),
        (3, 1, 512, "pallas"),
    ],
}
# (level, conv_input_T, channels, dilation) for the interior conv chains.
CONVS_BY_FRAMES = {
    243: [
        (1, 241, 64, 3),
        (2, 235, 128, 9),
        (3, 217, 256, 27),
        (4, 163, 512, 81),
    ],
    81: [
        (1, 79, 128, 3),
        (2, 73, 256, 9),
        (3, 55, 512, 27),
    ],
}


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
    ap.add_argument("--frames", type=int, default=243,
                    choices=sorted(GABS_BY_FRAMES))
    ap.add_argument("--stages",
                    default="gab0,gab1,gab2,gab3,gab4,convs,total")
    a = ap.parse_args()
    want = {s.strip() for s in a.stages.split(",") if s.strip()}

    cfg = config_for_frames(a.frames, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    bf16 = jnp.bfloat16
    params_b = jax.tree.map(
        lambda v: v.astype(bf16) if jnp.issubdtype(v.dtype, jnp.floating)
        else v, params)
    r = np.random.default_rng(0)
    # Per-level storage dtype of the production route (81f restores f32 at
    # the C=512 tail level — storage_dtype_levels, perf_lab32).
    lds = [jnp.float32 if cfg.storage_dtype_for(i, "bfloat16") == "float32"
           else bf16 for i in range(cfg.num_levels)]

    for i, t, c, impl in GABS_BY_FRAMES[a.frames]:
        if f"gab{i}" not in want:
            continue
        x = jnp.asarray(
            r.standard_normal((B, t, 17, c)).astype(np.float32)) \
            .astype(lds[i])

        def gab(p, s, xx, _i=i, _impl=impl):
            return graph_attention_block(
                xx, p["gabs"][_i], s["gabs"][_i], statics, train=False,
                dropout_rate=0.0, rng=None, gab_impl=_impl,
                gab_tile_budget=cfg.gab_tile_budget,
                gab_softmax_group=cfg.gab_softmax_group,
                gab_pbatch_max_pack=cfg.gab_pbatch_max_pack,
                prec=_prec(cfg, f"gab{_i}"))[0]
        try:
            ms, cs = _timed_scan(
                gab, params if lds[i] == jnp.float32 else params_b, state, x)
            print(f"  gab{i} C={c} T={t} {impl}: {ms:.2f} ms "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — Mosaic 500s surface here
            print(f"  gab{i} C={c} {impl} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)

    if "convs" in want:
        # All XLA conv work lumped in one jit: expand conv, the four
        # interior conv chains (dilated conv -> BN -> ReLU -> 1x1 -> BN
        # -> ReLU -> +residual), and the shrink.
        convs_tbl = CONVS_BY_FRAMES[a.frames]
        xs = [jnp.asarray(r.standard_normal(
            (B, t, 17, c)).astype(np.float32)).astype(lds[lvl])
            for lvl, t, c, _ in convs_tbl]
        x_raw = jnp.asarray(r.standard_normal(
            (B, a.frames, 17, 2)).astype(np.float32)).astype(lds[0])
        x_shrink = jnp.asarray(r.standard_normal(
            (B, 1, 17 * cfg.out_channels)).astype(np.float32)) \
            .astype(lds[-1])

        def convs(p, _s, *inputs):
            x_r, x_sh = inputs[0], inputs[1]
            outs = []
            y = temporal_conv(x_r, p["expand_conv"]["w"],
                              precision=xla_precision("high"))
            outs.append(jnp.sum(y.astype(jnp.float32)))
            for (lvl, _t, _c, dil), xx in zip(convs_tbl, inputs[2:]):
                bp = jax.tree.map(
                    lambda v, _d=lds[lvl]: v.astype(_d)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v,
                    p["temporal"][lvl - 1])
                lp = _prec(cfg, f"lvl{lvl}")
                res = xx[:, dil: xx.shape[1] - dil]
                z = temporal_conv(xx, bp["conv_t"]["w"], dilation=dil,
                                  precision=lp("temporal"))
                z = jax.nn.relu(z)  # BN folds to affine at eval; ~free
                z = pointwise(z, bp["conv_1"]["w"], precision=lp("mid1x1"))
                z = jax.nn.relu(z)
                outs.append(jnp.sum((res + z).astype(jnp.float32)))
            y = pointwise(x_sh.reshape(B, 1, 17, cfg.out_channels),
                          p["shrink"]["w"].reshape(cfg.out_channels, -1)
                          if p["shrink"]["w"].ndim == 2
                          else p["shrink"]["w"],
                          precision=xla_precision("high"))
            outs.append(jnp.sum(y.astype(jnp.float32)))
            return jnp.stack(outs)

        try:
            ms, cs = _timed_scan(convs, params_b, state, x_raw, x_shrink,
                                 *xs)
            print(f"  convs (expand + lvl1-4 chains + shrink, XLA): "
                  f"{ms:.2f} ms (compile {cs:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  convs FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)

    if "total" in want:
        x = jnp.asarray(r.standard_normal(
            (B, a.frames, 17, 2)).astype(np.float32))

        def full(p, s, xx):
            return gastnet_forward(p, s, xx, cfg, variant="dilated",
                                   train=False)[0]
        ms, cs = _timed_scan(full, params, state, x)
        print(f"  total (adopted route): {ms:.2f} ms = {B*1000/ms:.0f} "
              f"seq/s (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
