"""Golden-number + convergence regression for the training stack.

Two complementary gates (VERDICT round 1, item 4):

1. Fixed-seed golden losses: N strided train steps from a fixed init on
   fixed data must reproduce recorded loss values EXACTLY, both on one
   device and sharded over the 8-virtual-device CPU mesh. Any silent
   numerics change in the forward, gradients, amsgrad optimizer
   (main.py:213-243 semantics) or BN statistics flips these bits.

   Regenerate after an *intentional* numerics change:
       PYTHONPATH=/root/repo python tests/test_golden.py

2. A quantitative convergence bar scaled to the reference's 49.5mm
   acceptance gate (trainval.py:111): on a well-posed synthetic lifting
   task (depth is a smooth deterministic function of the 2D pose, so the
   2D->3D mapping is learnable to ~0), short training must reach
   <30mm held-out MPJPE. A subtly broken update rule still "reduces
   loss" but cannot pass this.
"""
import os

# Same backend forcing as conftest.py, so regeneration mode
# (`python tests/test_golden.py`) sees the identical 8-device CPU backend.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from gastx.eval.metrics import mpjpe
from gastx.models import GastNetConfig, gastnet_forward, init_gastnet
from gastx.parallel import make_mesh, replicate, shard_batch
from gastx.train import init_train_state, make_train_step

CFG = GastNetConfig(filter_widths=(3, 3), channels=16, dropout=0.1)
N_STEPS = 5
BATCH = 16

# -- recorded goldens (float32, exact) ---------------------------------------
# jax 0.8.x CPU backend; regenerate with `python tests/test_golden.py`.
GOLDEN_1DEV = [1.6281671524047852, 1.7215218544006348, 1.5943187475204468,
               1.5980960130691528, 1.6206575632095337]
GOLDEN_8DEV = [1.628166913986206, 1.7215217351913452, 1.5943191051483154,
               1.5980883836746216, 1.6206563711166382]


def _run_steps(mesh=None):
    params, bn_state = init_gastnet(jax.random.PRNGKey(0), CFG)
    ts = init_train_state(params, bn_state)
    if mesh is not None:
        ts = replicate(mesh, ts)
    step = make_train_step(CFG, variant="strided")
    rng = np.random.default_rng(42)
    rf = CFG.receptive_field()
    losses = []
    for i in range(N_STEPS):
        x2d = rng.standard_normal((BATCH, rf, 17, 2)).astype(np.float32)
        x3d = rng.standard_normal((BATCH, 1, 17, 3)).astype(np.float32)
        w = np.ones((BATCH,), np.float32)
        key = jax.random.PRNGKey(100 + i)
        lr = jnp.float32(1e-3)
        if mesh is None:
            ts, loss = step(ts, jnp.asarray(x2d), jnp.asarray(x3d),
                            jnp.asarray(w), lr, key)
        else:
            with mesh:
                (b2, b3, ws), _ = shard_batch(mesh, x2d, x3d, w)
                ts, loss = step(ts, b2, b3, ws, lr, key)
        losses.append(float(jax.device_get(loss)))
    return losses


def test_golden_losses_single_device():
    assert GOLDEN_1DEV is not None, "goldens not recorded"
    got = _run_steps(mesh=None)
    assert got == GOLDEN_1DEV, f"golden mismatch:\n got {got}\n exp {GOLDEN_1DEV}"


def test_golden_losses_8dev_mesh():
    assert GOLDEN_8DEV is not None, "goldens not recorded"
    mesh = make_mesh(jax.devices()[:8])
    got = _run_steps(mesh=mesh)
    assert got == GOLDEN_8DEV, f"golden mismatch:\n got {got}\n exp {GOLDEN_8DEV}"


# -- convergence gate ---------------------------------------------------------

# Task + schedule live in gastx.data.synthetic so the on-chip
# precision-tier lab (scripts/perf_lab5.py) measures the SAME gate.
from gastx.data.synthetic import (  # noqa: E402
    CONVERGENCE_BATCH,
    CONVERGENCE_GATE_MM,
    CONVERGENCE_STEPS,
    convergence_lr,
    wellposed_batch as _wellposed_batch,
)


def test_training_converges_below_30mm():
    """520 fixed-seed strided train steps with a 3-stage lr decay must take
    held-out MPJPE from ~870mm to <30mm (measured 28.1mm) — the synthetic
    analogue of the reference's <49.5mm H36M acceptance gate
    (trainval.py:111). A subtly wrong optimizer/BN/gradient still reduces
    loss but cannot hit this bar in this step budget."""
    cfg = GastNetConfig(filter_widths=(3, 3), channels=32, dropout=0.0)
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
        return float(mpjpe(pred, target)) * 1000.0

    before = held_out_mm(ts)
    n_steps, batch = CONVERGENCE_STEPS, CONVERGENCE_BATCH
    x2d, x3d = _wellposed_batch(rng, n_steps * batch, rf)
    w = jnp.ones((batch,), jnp.float32)
    for i in range(n_steps):
        sl = slice(i * batch, (i + 1) * batch)
        lr = convergence_lr(i)
        ts, _ = step(ts, jnp.asarray(x2d[sl]), jnp.asarray(x3d[sl]), w,
                     jnp.float32(lr), jax.random.PRNGKey(i))
    after = held_out_mm(ts)
    assert before > 400.0, f"untrained error suspiciously low: {before:.1f}mm"
    assert after < CONVERGENCE_GATE_MM, (
        f"convergence gate failed: {before:.1f}mm -> {after:.1f}mm (>=30mm)")


if __name__ == "__main__":
    # Regeneration mode: print the goldens to paste into this file.
    print("GOLDEN_1DEV =", _run_steps(mesh=None))
    mesh = make_mesh(jax.devices()[:8])
    print("GOLDEN_8DEV =", _run_steps(mesh=mesh))
