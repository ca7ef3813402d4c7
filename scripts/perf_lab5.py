"""Perf lab 5: matmul-precision tiers in the TRAIN step, measured on-chip.

Question: training runs all-"high" (bit-trustworthy but 3-pass). Do the
faster tiers still converge, and what do they buy? Precision tiers are
no-ops on CPU, so this is only measurable on the TPU:

  1. convergence: the test_golden.py well-posed synthetic lifting task
     (520 steps, 3-stage lr decay, <30mm gate) run per tier;
  2. throughput: full-size (fw 3,3,3, ch 128, B=1024) strided train steps
     in one lax.scan per tier (same methodology as bench.measure_train_step).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab5.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gastx.data.synthetic import (CONVERGENCE_BATCH, CONVERGENCE_STEPS,
                                  convergence_lr,
                                  wellposed_batch as _wellposed_batch)
from gastx.eval.metrics import mpjpe
from gastx.models import GastNetConfig, gastnet_forward, init_gastnet
from gastx.models.config import TPU_MIXED_PRECISION_OVERRIDES
from gastx.train import init_train_state, make_train_step

TIERS = [
    ("high", "high", ()),
    ("mixed", "high", TPU_MIXED_PRECISION_OVERRIDES),
    ("default", "default", ()),
]


def convergence(prec, overrides):
    cfg = GastNetConfig(filter_widths=(3, 3), channels=32, dropout=0.0,
                        matmul_precision=prec,
                        precision_overrides=tuple(overrides))
    params, bn_state = init_gastnet(jax.random.PRNGKey(1), cfg)
    ts = init_train_state(params, bn_state)
    step = make_train_step(cfg, variant="strided")
    rf = cfg.receptive_field()

    rng = np.random.default_rng(7)
    ex2d, ex3d = _wellposed_batch(rng, 256, rf)
    ex2d, ex3d = jnp.asarray(ex2d), jnp.asarray(ex3d)

    def held_out_mm(ts):
        pred, _ = gastnet_forward(ts.params, ts.bn_state, ex2d, cfg,
                                  variant="strided", train=False)
        target = ex3d.at[:, :, 0].set(0.0)
        return float(jax.device_get(mpjpe(pred, target))) * 1000.0

    before = held_out_mm(ts)
    n_steps, batch = CONVERGENCE_STEPS, CONVERGENCE_BATCH
    x2d, x3d = _wellposed_batch(rng, n_steps * batch, rf)
    w = jnp.ones((batch,), jnp.float32)
    for i in range(n_steps):
        sl = slice(i * batch, (i + 1) * batch)
        lr = convergence_lr(i)
        ts, _ = step(ts, jnp.asarray(x2d[sl]), jnp.asarray(x3d[sl]), w,
                     jnp.float32(lr), jax.random.PRNGKey(i))
    return before, held_out_mm(ts)


def throughput(prec, overrides):
    # One source of truth for the timed step: bench.measure_train_step.
    import bench

    return bench.measure_train_step(matmul_precision=prec,
                                    precision_overrides=tuple(overrides))


def main():
    for name, prec, ov in TIERS:
        thr = throughput(prec, ov)
        print(f"[{name:8s}] train-step throughput: {thr:9.1f} seq/s",
              flush=True)
    for name, prec, ov in TIERS:
        before, after = convergence(prec, ov)
        gate = "PASS" if after < 30.0 else "FAIL"
        print(f"[{name:8s}] convergence: {before:6.1f}mm -> {after:6.2f}mm "
              f"({gate} <30mm gate)", flush=True)


if __name__ == "__main__":
    main()
