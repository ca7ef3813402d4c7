"""Perf lab 20: ablation attribution INSIDE the fused GAB kernel (gab0).

perf_lab18 falsified the v2 hypothesis: replacing the per-joint FMA
loops with sublane rolls made the kernels SLOWER (gab0 0.71x), and
lab17 already showed precision emulation is ~free at gab0 (prod vs
all-default within 0.4 ms). So the 32 ms (40 us/grid-step) structural
cost sits somewhere among: the local per-joint FMA loop, the per-head
softmax chains on lane-padded (TM,17,128) tensors, the 16 rank-1 score
dots, the 8 batched apply dots, or the projection/concat matmuls.

This lab times the production gab0 kernel with pieces surgically
removed (numerically wrong on purpose — each variant keeps shapes and
dataflow so the remaining work is untouched):

  full        — the production kernel (reference)
  no_locloop  — local aggregation = h0 * wself only (no neighbor FMAs)
  no_softmax  — attn = leaky(f) + ck (skip max/exp/sum/div)
  no_scores   — f = broadcast theta slice (skip the 16 rank-1 dots)
  no_apply    — gy = gx (skip the 8 batched dotg)
  no_global   — global branch = relu(bn(x @ acat-shaped dot)) stub
  no_local    — local branch = relu-ish stub (one dot)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab20.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gastx.models import config_for_frames, graph_statics, init_gastnet
from gastx.ops.pallas.fused_gab import (KERNEL_OPS, _concat_ins,
                                        _ensure_f32, _global_ins,
                                        _local_ins, _make_dots, _tile_rows)
from gastx.ops.pallas.precision import resolve_tiers, tiers_from_pairs

B = 1024


def _kernel_ablate(x_ref, *refs, num_heads, inter, g_ch, j,
                   col_sym, col_con, tiers, ablate):
    out_ref = refs[-1]
    (w0s_ref, w1s_ref, wself_s_ref, wnbr_s_ref,
     w0c_ref, w1c_ref, wself_c_ref, wnbr_c_ref,
     bnsym_scale_ref, bnsym_shift_ref, bncon_scale_ref,
     bncon_shift_ref, lcat_w_ref, lcat_scale_ref, lcat_shift_ref,
     theta_w_ref, phi_w_ref, g_w_ref, theta_b_ref, phi_b_ref,
     g_b_ref, proj_t_ref, proj_p_ref, ck_ref, acat_w_ref,
     acat_scale_ref, acat_shift_ref,
     gcat_w_ref, gcat_scale_ref, gcat_shift_ref) = refs[:-1]
    tm = x_ref.shape[0]
    c = x_ref.shape[2]
    xr = x_ref[:].astype(jnp.float32).reshape(tm * j, c)
    dot, dotg = _make_dots(tiers, False)

    # ---- local branch ----
    if ablate == "no_local":
        local = jnp.maximum(dot(xr, w0s_ref[:], "local_sem")
                            * lcat_scale_ref[:] + lcat_shift_ref[:], 0.0)
    else:
        def sem_conv(w0_ref, w1_ref, wself_ref, wnbr_ref, col):
            h0 = dot(xr, w0_ref[:], "local_sem").reshape(tm, j, c)
            h1 = dot(xr, w1_ref[:], "local_sem").reshape(tm, j, c)
            rows = []
            d = col.shape[1]
            for jq in range(j):
                acc = h0[:, jq, :] * wself_ref[jq, :]
                if ablate != "no_locloop":
                    for dd in range(d):
                        acc = acc + (h1[:, int(col[jq, dd]), :]
                                     * wnbr_ref[jq, dd, :])
                rows.append(acc)
            return jnp.stack(rows, axis=1)

        a = sem_conv(w0s_ref, w1s_ref, wself_s_ref, wnbr_s_ref, col_sym)
        b = sem_conv(w0c_ref, w1c_ref, wself_c_ref, wnbr_c_ref, col_con)
        a = jnp.maximum(a.reshape(tm * j, c) * bnsym_scale_ref[:]
                        + bnsym_shift_ref[:], 0.0)
        b = jnp.maximum(b.reshape(tm * j, c) * bncon_scale_ref[:]
                        + bncon_shift_ref[:], 0.0)
        local = dot(a, lcat_w_ref[0:c, :], "local_cat") + \
            dot(b, lcat_w_ref[c:2 * c, :], "local_cat")
        local = jnp.maximum(local * lcat_scale_ref[:]
                            + lcat_shift_ref[:], 0.0)

    # ---- global branch ----
    theta = dot(xr, theta_w_ref[:], "attn_proj") + theta_b_ref[:]
    phi = dot(xr, phi_w_ref[:], "attn_proj") + phi_b_ref[:]
    gx = (dot(xr, g_w_ref[:], "attn_proj")
          + g_b_ref[:]).reshape(tm, j, num_heads * g_ch)
    if ablate == "no_global":
        globl = jnp.maximum(
            dot(xr, w1s_ref[:], "attn_cat") * acat_scale_ref[:]
            + acat_shift_ref[:], 0.0)
    else:
        head_outs = []
        for k in range(num_heads):
            gk = gx[:, :, k * g_ch:(k + 1) * g_ch]
            if ablate == "no_apply":
                head_outs.append(gk)
                continue
            if ablate == "no_scores":
                f = theta[:, k * inter:k * inter + 1].reshape(tm, j, 1)
                f = f + jnp.zeros((tm, 1, j), jnp.float32)
            else:
                tk = theta[:, k * inter:(k + 1) * inter]
                pk = phi[:, k * inter:(k + 1) * inter]
                sa = dot(tk, proj_t_ref[:, k:k + 1],
                         "attn_score").reshape(tm, j, 1)
                sb = dot(pk, proj_p_ref[:, k:k + 1],
                         "attn_score").reshape(tm, j, 1)
                f = sa + jnp.swapaxes(sb, 1, 2)
            f = jnp.where(f > 0, f, 0.2 * f)
            if ablate == "no_softmax":
                attn = f + ck_ref[k * j:(k + 1) * j, :]
            else:
                f = f - jnp.max(f, axis=2, keepdims=True)
                ef = jnp.exp(f)
                attn = ef / jnp.sum(ef, axis=2, keepdims=True)
                attn = attn + ck_ref[k * j:(k + 1) * j, :]
            head_outs.append(dotg(
                attn, gk, (((2,), (1,)), ((0,), (0,))), "attn_apply"))
        gy = jnp.concatenate(head_outs, axis=2)
        gy = dot(gy.reshape(tm * j, num_heads * g_ch), acat_w_ref[:],
                 "attn_cat")
        globl = jnp.maximum(gy * acat_scale_ref[:] + acat_shift_ref[:], 0.0)

    y = dot(xr, gcat_w_ref[0:c, :], "gab_cat") + \
        dot(local, gcat_w_ref[c:2 * c, :], "gab_cat") + \
        dot(globl, gcat_w_ref[2 * c:3 * c, :], "gab_cat")
    y = jnp.maximum(y * gcat_scale_ref[:] + gcat_shift_ref[:], 0.0)
    out_ref[:] = y.reshape(tm, j, 2 * c).astype(out_ref.dtype)


def ablated_gab(x, params, state, sym_idx, con_idx, *, precs, ablate):
    b_, t_, j_, c_ = x.shape
    params, state = _ensure_f32(params), _ensure_f32(state)
    lp, gp = params["local"], params["global"]
    k, _, inter = gp["theta_w"].shape
    g_ch = gp["g_w"].shape[2]
    tiers = tiers_from_pairs(precs, KERNEL_OPS)
    local_ins, col_s, col_c = _local_ins(lp, state, sym_idx, con_idx, j_, c_)
    ins = local_ins + _global_ins(gp, state, j_, c_, k, inter, g_ch) \
        + _concat_ins(params, state, c_)
    xf, tm, m_total, pad = _tile_rows(x, 0, 4096)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_kernel_ablate, num_heads=k, inter=inter,
                          g_ch=g_ch, j=j_, col_sym=col_s, col_con=col_c,
                          tiers=tiers, ablate=ablate),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], j_, 2 * c_), x.dtype),
        grid=(xf.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, j_, c_), lambda i: (i, 0, 0),
                               memory_space=vm)] + [s for _, s in ins],
        out_specs=pl.BlockSpec((tm, j_, 2 * c_), lambda i: (i, 0, 0),
                               memory_space=vm),
    )(xf, *[a for a, _ in ins])
    if pad:
        out = out[:m_total]
    return out.reshape(b_, t_, j_, 2 * c_)


def _timed(fn, x, iters=30):
    @jax.jit
    def many(x):
        def body(carry, _):
            xx = x + carry * jnp.asarray(1e-12, x.dtype)
            return fn(xx).ravel()[0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    t0 = time.perf_counter()
    jax.device_get(many(x))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(x))
    return (time.perf_counter() - t0) / iters * 1000.0, cs


def main():
    cfg = config_for_frames(27, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    statics = graph_statics(cfg.layout)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)

    def p0(op):
        v = cfg.precision_for(f"gab0.{op}")
        return v if v is not None else cfg.precision_for(op)

    with jax.default_matmul_precision(cfg.matmul_precision):
        precs = resolve_tiers(p0, KERNEL_OPS)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, 25, 17, 128)).astype(np.float32))
    gp0, gs0 = params["gabs"][0], state["gabs"][0]

    base_ms = None
    for ablate in ("full", "no_locloop", "no_softmax", "no_scores",
                   "no_apply", "no_global", "no_local"):
        try:
            with jax.default_matmul_precision(cfg.matmul_precision):
                ms, cs = _timed(
                    lambda xx: ablated_gab(xx, gp0, gs0, sym, con,
                                           precs=precs, ablate=ablate), x0)
            if ablate == "full":
                base_ms = ms
            saved = f" (saves {base_ms - ms:+.2f} ms)" if base_ms else ""
            print(f"[gab0 {ablate}] {ms:.2f} ms{saved} (compile {cs:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"[gab0 {ablate}] FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
