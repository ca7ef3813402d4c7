"""Perf lab 2: error/speed attribution per op-class and per level.

Each variant runs all matmuls at "high" EXCEPT one group at "default" —
the measured max_err_mm is that group's error contribution, and the seq/s
delta vs the all-high anchor is the speed that group's high-precision mode
costs. Groups are chosen along both axes: op class (convs / local / attn /
gab_cat) and level (gab0 / gab1 / gab2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab2.py
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

GAB_OPS = ("gab_cat", "local_sem", "local_off", "local_cat", "attn_proj",
           "attn_score", "attn_apply", "attn_cat")


def gab_level_default(level: int):
    return tuple((f"gab{level}.{op}", "default") for op in GAB_OPS)


VARIANTS = [
    ("x_convs", (("temporal", "default"), ("mid1x1", "default"),
                 ("expand", "default"), ("shrink", "default"))),
    ("x_gab0", gab_level_default(0)),
    ("x_gab1", gab_level_default(1)),
    ("x_gab2", gab_level_default(2)),
    ("x_gabcat", (("gab_cat", "default"),)),
    ("x_local", (("local_sem", "default"), ("local_off", "default"),
                 ("local_cat", "default"))),
    ("x_attn", (("attn_proj", "default"), ("attn_score", "default"),
                ("attn_apply", "default"), ("attn_cat", "default"))),
]


def main():
    base = GastNetConfig(filter_widths=(3, 3, 3), channels=128, dropout=0.05)
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

    ref_cfg = GastNetConfig(filter_widths=(3, 3, 3), channels=128,
                            dropout=0.05, matmul_precision="highest")
    y_ref = jax.device_get(jax.jit(fwd(ref_cfg))(params, state, x))

    for name, overrides in VARIANTS:
        cfg = GastNetConfig(filter_widths=(3, 3, 3), channels=128,
                            dropout=0.05, matmul_precision="high",
                            precision_overrides=overrides)
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

        jax.device_get(many(params, state, x))
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
