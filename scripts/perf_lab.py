"""Perf lab: sweep attention/local layouts x precision splits on the chip.

For each variant prints ONE JSON line with steady-state device throughput
(seq/s, measured inside a single jitted lax.scan, synced once — see
CLAUDE.md on axon timing) and the max output deviation in mm against the
matmul_precision="highest" forward (the parity-true anchor, itself ~1e-6 mm
from the torch reference per PARITY.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import GastNetConfig, gastnet_forward, init_gastnet

BATCH = 1024
ITERS = 30

CONV_HIGH = (("expand", "high"), ("temporal", "high"), ("mid1x1", "high"),
             ("shrink", "high"))
GRAPH_HIGH = (("gab_cat", "high"), ("local_cat", "high"),
              ("attn_cat", "high"), ("attn_proj", "high"),
              ("local_sem", "high"))
TINY_DEFAULT = (("attn_apply", "default"), ("attn_score", "default"),
                ("local_off", "default"))

VARIANTS = [
    # name, matmul_precision, overrides, attn_impl, local_impl
    ("high_einsum_einsum", "high", (), "einsum", "einsum"),
    ("default_einsum_einsum", "default", (), "einsum", "einsum"),
    ("high_batched_einsum", "high", (), "batched", "einsum"),
    ("high_einsum_gather", "high", (), "einsum", "gather"),
    ("high_batched_gather", "high", (), "batched", "gather"),
    ("default_batched_gather", "default", (), "batched", "gather"),
    ("convhigh_batched_gather", "default", CONV_HIGH, "batched", "gather"),
    ("graphhigh_batched_gather", "default", GRAPH_HIGH, "batched", "gather"),
    ("tinydefault_batched_gather", "high", TINY_DEFAULT, "batched",
     "gather"),
]


def build(precision, overrides, attn_impl, local_impl):
    return GastNetConfig(filter_widths=(3, 3, 3), channels=128,
                         dropout=0.05, matmul_precision=precision,
                         precision_overrides=overrides,
                         attn_impl=attn_impl, local_impl=local_impl)


def main():
    base = build("high", (), "einsum", "einsum")
    params, state = init_gastnet(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 27, 17, 2)).astype(
        np.float32))

    def fwd(cfg):
        def f(params, state, x):
            y, _ = gastnet_forward(params, state, x, cfg,
                                   variant="dilated", train=False)
            return y
        return f

    ref_cfg = build("highest", (), "einsum", "einsum")
    y_ref = jax.device_get(jax.jit(fwd(ref_cfg))(params, state, x))
    print(json.dumps({"variant": "anchor_highest", "note": "error anchor"}),
          flush=True)

    for name, precision, overrides, attn_impl, local_impl in VARIANTS:
        cfg = build(precision, overrides, attn_impl, local_impl)
        f = fwd(cfg)

        y = jax.device_get(jax.jit(f)(params, state, x))
        err_mm = float(np.abs(y - y_ref).max()) * 1000.0

        @jax.jit
        def many(params, state, x, f=f):
            def body(carry, _):
                xx = x + carry * 1e-12
                return f(params, state, xx).sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return out

        jax.device_get(many(params, state, x))  # compile + warmup
        t0 = time.perf_counter()
        jax.device_get(many(params, state, x))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name,
            "seq_per_s": round(BATCH * ITERS / dt, 1),
            "max_err_mm": round(err_mm, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
