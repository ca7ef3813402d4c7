"""Perf lab 31: train-step attribution (VERDICT r3 item 4 groundwork).

The eval forward gained +47% from the fused kernels; the train step is
pinned to the XLA path (train-mode BN needs interior batch statistics the
single-pass kernels cannot produce — see DESIGN.md r4 note). Before any
backward-kernel investment, attribute where the strided train step's time
actually goes, per precision tier:

  fwd        — train-mode forward + loss only (incl. BN batch stats)
  fwd+bwd    — value_and_grad, no optimizer
  full       — train_step_body (fwd + bwd + amsgrad + BN state)

and measure the two candidate XLA-side levers: (a) donated-buffer full
step is bench's standing number; (b) jax.remat of the forward (trades
HBM-resident intermediates for recompute — the step is memory-traffic
heavy at B=1024).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab31.py
       [--tiers high,mixed,default] [--batch 1024]
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models import GastNetConfig, gastnet_forward, init_gastnet
from gastx.models.config import TPU_MIXED_PRECISION_OVERRIDES
from gastx.train.loop import init_train_state, train_step_body
from gastx.train.optimizer import scale_by_amsgrad

ITERS = 20

TIERS = {
    "high": ("high", ()),
    "mixed": ("high", TPU_MIXED_PRECISION_OVERRIDES),
    "default": ("default", ()),
}


def _data(batch):
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.standard_normal(
        (batch, 27, 17, 2)).astype(np.float32))
    x3d = jnp.asarray(rng.standard_normal(
        (batch, 1, 17, 3)).astype(np.float32))
    weight = jnp.ones((batch,), jnp.float32)
    return x2d, x3d, weight


def _time_scan(many, *args):
    t0 = time.perf_counter()
    jax.device_get(many(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(many(*args))
    return time.perf_counter() - t0, compile_s


def measure(tier_name: str, batch: int):
    mp, po = TIERS[tier_name]
    cfg = GastNetConfig(filter_widths=(3, 3, 3), channels=128, dropout=0.05,
                        matmul_precision=mp, precision_overrides=tuple(po))
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    tx = scale_by_amsgrad()
    ts = init_train_state(params, state, tx)
    x2d, x3d, weight = _data(batch)
    lr = jnp.float32(1e-3)

    def loss_fn(params, bn_state, key, fwd=gastnet_forward):
        target = x3d.at[:, :, 0].set(0.0)
        pred, new_bn = fwd(params, bn_state, x2d, cfg,
                           variant="strided", train=True, rng=key)
        err = jnp.mean(jnp.linalg.norm(pred - target, axis=-1), axis=(1, 2))
        return jnp.sum(err * weight) / jnp.sum(weight), new_bn

    # --- fwd only (train mode, incl. BN stats) ---
    @jax.jit
    def many_fwd(params, bn_state):
        def body(carry, i):
            loss, new_bn = loss_fn(params, bn_state,
                                   jax.random.fold_in(jax.random.PRNGKey(0),
                                                      i))
            return carry + loss, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS))
        return out

    dt, cs = _time_scan(many_fwd, ts.params, ts.bn_state)
    print(f"[{tier_name} B={batch}] fwd-only: "
          f"{batch * ITERS / dt:.0f} seq/s ({dt/ITERS*1e3:.1f} ms/iter, "
          f"compile {cs:.0f}s)", flush=True)

    # --- fwd + bwd ---
    @jax.jit
    def many_grad(params, bn_state):
        def body(carry, i):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bn_state, jax.random.fold_in(jax.random.PRNGKey(0),
                                                     i))
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return carry + loss + gsum * 1e-12, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return out

    dt, cs = _time_scan(many_grad, ts.params, ts.bn_state)
    print(f"[{tier_name} B={batch}] fwd+bwd: "
          f"{batch * ITERS / dt:.0f} seq/s ({dt/ITERS*1e3:.1f} ms/iter, "
          f"compile {cs:.0f}s)", flush=True)

    # --- fwd(remat) + bwd ---
    # (this JAX build's jax.checkpoint takes no static_argnames: close
    # over the static config/variant instead)
    _remat_inner = jax.checkpoint(
        lambda p, s, xx, key: gastnet_forward(
            p, s, xx, cfg, variant="strided", train=True, rng=key))

    def fwd_remat(p, s, xx, _cfg, *, variant, train, rng):
        assert variant == "strided" and train
        return _remat_inner(p, s, xx, rng)

    @jax.jit
    def many_remat(params, bn_state):
        def body(carry, i):
            (loss, _), grads = jax.value_and_grad(
                functools.partial(loss_fn, fwd=fwd_remat), has_aux=True)(
                params, bn_state, jax.random.fold_in(jax.random.PRNGKey(0),
                                                     i))
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return carry + loss + gsum * 1e-12, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return out

    try:
        dt, cs = _time_scan(many_remat, ts.params, ts.bn_state)
        print(f"[{tier_name} B={batch}] fwd(remat)+bwd: "
              f"{batch * ITERS / dt:.0f} seq/s ({dt/ITERS*1e3:.1f} ms/iter, "
              f"compile {cs:.0f}s)", flush=True)
    except Exception as exc:
        print(f"[{tier_name} B={batch}] fwd(remat)+bwd FAILED: "
              f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)

    # --- full step (bench-equivalent) ---
    @jax.jit
    def many_full(ts):
        def body(ts, key):
            new_ts, loss = train_step_body(cfg, "strided", tx, ts, x2d, x3d,
                                           weight, lr, key)
            return new_ts, loss
        keys = jax.random.split(jax.random.PRNGKey(0), ITERS)
        final, losses = jax.lax.scan(body, ts, keys)
        return losses[-1]

    dt, cs = _time_scan(many_full, ts)
    print(f"[{tier_name} B={batch}] full step: "
          f"{batch * ITERS / dt:.0f} seq/s ({dt/ITERS*1e3:.1f} ms/iter, "
          f"compile {cs:.0f}s)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiers", default="high,mixed,default")
    ap.add_argument("--batch", type=int, default=1024)
    a = ap.parse_args()
    for t in a.tiers.split(","):
        measure(t.strip(), a.batch)


if __name__ == "__main__":
    main()
