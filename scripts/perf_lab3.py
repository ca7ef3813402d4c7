"""Perf lab 3: per-attention-op error attribution + mixed-precision combos.

perf_lab2 measured (v5e, B=1024, vs all-"high" anchor 10.6k seq/s):
  x_local (all local-graph matmuls at default)  11539 seq/s  0.0074 mm
  x_attn  (all attention matmuls at default)    12667 seq/s  0.0896 mm
  x_convs / x_gabcat / x_gab{0,1,2}             -> all break the 0.1 mm budget
This lab splits x_attn by op class and measures the promising combos, to
find the fastest configuration measured <=0.05 mm (2x parity-budget margin).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab3.py
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

LOCAL = (("local_sem", "default"), ("local_off", "default"),
         ("local_cat", "default"))
ATTN_ALL = (("attn_proj", "default"), ("attn_score", "default"),
            ("attn_apply", "default"), ("attn_cat", "default"))

VARIANTS = [
    ("attn_proj", (("attn_proj", "default"),)),
    ("attn_score", (("attn_score", "default"),)),
    ("attn_apply", (("attn_apply", "default"),)),
    ("attn_cat", (("attn_cat", "default"),)),
    ("local+attn", LOCAL + ATTN_ALL),
    ("local+attn-proj", LOCAL + (("attn_score", "default"),
                                 ("attn_apply", "default"),
                                 ("attn_cat", "default"))),
    ("local+attn-cat", LOCAL + (("attn_proj", "default"),
                                ("attn_score", "default"),
                                ("attn_apply", "default"))),
    ("local+proj", LOCAL + (("attn_proj", "default"),)),
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
