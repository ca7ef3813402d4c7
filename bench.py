"""gastx benchmark: 27-frame 17-joint lifting throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "seq/s", "vs_baseline": N}

A "sequence" is one receptive-field (27-frame) 2D keypoint window lifted to a
3D pose — the unit of work of the reference's training hot loop and streaming
inference. ``vs_baseline`` is the ratio against the reference PyTorch
implementation on CPU (the reference repo ships no GPU numbers; see
BASELINE.md). The baseline is measured live from /root/reference when
available and cached in BASELINE_CPU.json; otherwise the cached/committed
value is used.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BASELINE_CPU.json")
# Fallback measured 2026-08-16 on the dev host (1 vCPU, torch 2.13 CPU):
# reference SpatioTemporalModel fp32 eval forward, batch 32.
FALLBACK_BASELINE_SEQS_PER_S = 14.12


def measure_reference_cpu(batch: int = 32, iters: int = 5) -> float:
    """Reference torch model throughput on CPU (seq/s)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_torch import build_reference_model, reference_available

    if not reference_available():
        raise RuntimeError("reference not available")
    import torch

    model = build_reference_model()
    x = torch.randn(batch, 27, 17, 2)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def get_baseline() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["seqs_per_s"]
    try:
        val = measure_reference_cpu()
        with open(CACHE, "w") as f:
            json.dump({"seqs_per_s": val,
                       "note": "reference torch CPU, batch32 fp32 eval"}, f)
        return val
    except Exception:
        if FALLBACK_BASELINE_SEQS_PER_S is None:
            return float("nan")
        return FALLBACK_BASELINE_SEQS_PER_S


def measure_gastx(batch: int = 1024, iters: int = 30) -> float:
    """Steady-state device throughput of the fp32 (parity-mode) forward.

    ``iters`` forwards run inside ONE jitted lax.scan and sync once via
    jax.device_get — this measures pure device time. (Per-call timing is
    meaningless on this host: the axon tunnel adds ~30ms dispatch RTT per
    call and block_until_ready does not actually block.)
    """
    import jax
    import jax.numpy as jnp

    from gastx.models import GastNetConfig, gastnet_forward, init_gastnet

    cfg = GastNetConfig(filter_widths=(3, 3, 3), channels=128, dropout=0.05)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)

    platform = jax.devices()[0].platform
    if platform == "cpu":
        batch, iters = 32, 3

    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * 1e-12  # serialize iterations, numerically inert
            y, _ = gastnet_forward(params, state, xx, cfg,
                                   variant="dilated", train=False)
            return y.sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 27, 17, 2)).astype(
        np.float32))
    jax.device_get(many(params, state, x))  # compile + warmup

    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    value = measure_gastx()
    baseline = get_baseline()
    vs = value / baseline if baseline == baseline else None  # NaN check
    print(json.dumps({
        "metric": "27f_17j_lifting_throughput",
        "value": round(value, 2),
        "unit": "seq/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
