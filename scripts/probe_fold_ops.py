"""Minimal remote-Mosaic probes for the fold-form score ops.

perf_lab38 (r5) showed form="fold" Mosaic-500s at every 243f/81f stage
while interpret mode is exact — and the remote compile service hides the
error text. This probes each suspect op IN ISOLATION as a one-op Pallas
kernel so the failing primitive can be identified by bisection:

  dot8     (TM*J, C) @ (C, 8) thin dot (8-lane MXU output)
  rshp     (TM*J, 8) -> (tm, j, 8) small-lane sublane-split reshape
  slice1   (tm, j, 8)[:, :, k:k+1] per-head 1-lane slices
  bias     (1, 8) VMEM ref broadcast-add
  full     the three chained (dot8 + bias + rshp + slice1 sum)

Each probe prints PASS/BLOCKED. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fold_ops.py \
      [--probes dot8,rshp,slice1,bias,full] [--tm 16] [--c 128]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J = 17
K = 8  # default; override with --k


def _full(*_):
    return (0,) * 2


def _run(name, kernel, ins, out_shape):
    try:
        specs = [pl.BlockSpec(v.shape, lambda *_: (0,) * v.ndim,
                              memory_space=pltpu.VMEM) for v in ins]
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=specs,
            out_specs=pl.BlockSpec(out_shape, lambda *_: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
        )
        y = jax.device_get(jax.jit(f)(*ins))
        print(f"[{name}] PASS (out {y.shape}, mean {float(np.mean(y)):.4f})",
              flush=True)
        return True
    except Exception as exc:  # noqa: BLE001 — Mosaic 500s land here
        print(f"[{name}] BLOCKED: {type(exc).__name__}: {str(exc)[:200]}",
              flush=True)
        return False


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probes", default="dot8,rshp,slice1,bias,full")
    ap.add_argument("--tm", type=int, default=16)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--k", type=int, default=0,
                    help="head count override (K'=16 is the Mosaic-500 "
                         "shape; 0 = keep the module default)")
    a = ap.parse_args()
    want = {s.strip() for s in a.probes.split(",") if s.strip()}
    tm, c = a.tm, a.c
    if a.k:
        globals()["K"] = a.k

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((tm * J, c)).astype(np.float32))
    w = jnp.asarray(r.standard_normal((c, K)).astype(np.float32))
    b = jnp.asarray(r.standard_normal((1, K)).astype(np.float32))
    s2 = jnp.asarray(r.standard_normal((tm * J, K)).astype(np.float32))
    s3 = jnp.asarray(r.standard_normal((tm, J, K)).astype(np.float32))

    if "dot8" in want:
        def k_dot8(x_ref, w_ref, o_ref):
            o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                               preferred_element_type=jnp.float32)
        _run("dot8", k_dot8, [x, w], (tm * J, K))

    if "rshp" in want:
        def k_rshp(s_ref, o_ref):
            o_ref[:] = s_ref[:].reshape(tm, J, K) * 2.0
        _run("rshp", k_rshp, [s2], (tm, J, K))

    if "slice1" in want:
        def k_slice(s_ref, o_ref):
            acc = jnp.zeros((tm, J, 1), jnp.float32)
            for kk in range(K):
                sa = s_ref[:][:, :, kk:kk + 1]
                acc = acc + sa + jnp.swapaxes(sa, 1, 2).sum(
                    axis=2, keepdims=True)
            o_ref[:] = acc
        _run("slice1", k_slice, [s3], (tm, J, 1))

    if "bias" in want:
        def k_bias(s_ref, b_ref, o_ref):
            o_ref[:] = s_ref[:] + b_ref[:]
        _run("bias", k_bias, [s2, b], (tm * J, K))

    if "full" in want:
        def k_full(x_ref, w_ref, b_ref, o_ref):
            s = jnp.dot(x_ref[:], w_ref[:],
                        preferred_element_type=jnp.float32) + b_ref[:]
            s = s.reshape(tm, J, K)
            acc = jnp.zeros((tm, J, 1), jnp.float32)
            for kk in range(K):
                sa = s[:, :, kk:kk + 1]
                acc = acc + sa
            o_ref[:] = acc
        _run("full", k_full, [x, w, b], (tm, J, 1))


if __name__ == "__main__":
    main()
