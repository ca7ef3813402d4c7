"""Perf lab 7: Mosaic dot-count compile budget + the 6-dot local kernel.

r2 bisection (CLAUDE.md): elementwise kernels compile in seconds; 1-dot
kernels in 3-9 min; the 3-dot head_attn kernel compiles and runs; the
~15-dot whole-block kernels SIGKILL the remote Mosaic helper. Nothing
between 3 and 15 was probed. This lab:

  1. compiles the REAL 6-dot candidate — the fused_gab_split local-branch
     kernel (gastx/ops/pallas/fused_gab.py::fused_local_branch, 6
     single-pass dots under the mixed inference preset) — and verifies it
     on-chip against the XLA local branch;
  2. probes synthetic N-dot kernels (N=9/12/15) to bracket the ceiling;
  3. A/Bs the full 27f eval forward with gab_impl="pallas_local" vs "xla"
     (the 4986a86 methodology: chained lax.scan iterations, one sync).

Each experiment runs in its own subprocess with a timeout, because a
compile-budget overrun can SIGKILL or hang the helper.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_lab7.py          # full driver
  ... perf_lab7.py --probe 9       # one synthetic probe
  ... perf_lab7.py --local 128     # real local kernel at C=128
  ... perf_lab7.py --e2e           # pallas_local vs xla end-to-end
"""
from __future__ import annotations

import functools
import subprocess
import sys
import time


def probe(n_dots: int):
    """Compile+run a synthetic kernel with ``n_dots`` chained DEFAULT-tier
    matmuls at realistic shapes (rows=32*17 tile, C=128)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tm, j, c = 32, 17, 128

    def kernel(x_ref, *refs):
        w_refs, out_ref = refs[:-1], refs[-1]
        y = x_ref[:].reshape(tm * j, c)
        for w_ref in w_refs:
            y = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            y = jnp.maximum(y, 0.0) * (1.0 / 128.0)
        out_ref[:] = y.reshape(tm, j, c)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4 * tm, j, c)).astype(np.float32))
    ws = [jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))
          for _ in range(n_dots)]
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(x.shape[0] // tm,),
        in_specs=[pl.BlockSpec((tm, j, c), lambda i: (i, 0, 0),
                               memory_space=vm)]
        + [pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=vm)
           for _ in ws],
        out_specs=pl.BlockSpec((tm, j, c), lambda i: (i, 0, 0),
                               memory_space=vm),
    )
    t0 = time.perf_counter()
    y = jax.device_get(out(x, *ws))
    dt = time.perf_counter() - t0
    assert np.isfinite(y).all()
    print(f"PROBE {n_dots} dots: COMPILED+RAN in {dt:.1f}s", flush=True)


def _gab_level(c_target: int):
    """(params, state, statics, cfg) for the GAB level with width c_target."""
    import jax

    from gastx.models import (config_for_frames, graph_statics, init_gastnet)

    cfg = config_for_frames(27, dropout=0.0)  # mixed preset, ch 128
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    level = {128: 0, 256: 1, 512: 2}[c_target]
    return (params["gabs"][level], state["gabs"][level],
            graph_statics(cfg.layout), cfg)


def run_local(c: int):
    """Compile + verify + time the real 6-dot local kernel at width C."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gastx.ops import graph as G
    from gastx.ops.pallas.fused_gab import KERNEL_OPS, fused_local_branch
    from gastx.ops.pallas.precision import resolve_tiers

    gp, gs, statics, cfg = _gab_level(c)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    with jax.default_matmul_precision(cfg.matmul_precision):
        precs = resolve_tiers(cfg.precision_for, KERNEL_OPS)
    print(f"local C={c} tiers: {dict(precs)}", flush=True)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 25, 17, c)).astype(np.float32))

    t0 = time.perf_counter()
    got = jax.device_get(fused_local_branch(x, gp, gs, sym, con, precs=precs))
    dt = time.perf_counter() - t0
    print(f"LOCAL C={c}: COMPILED+RAN in {dt:.1f}s", flush=True)

    # XLA reference with the same precision tiers
    with jax.default_matmul_precision(cfg.matmul_precision):
        ref, _ = jax.jit(functools.partial(
            G.local_graph, statics=statics, train=False, dropout_rate=0.0,
            prec=cfg.precision_for))(x, gp["local"], gs["local"])
    ref = jax.device_get(ref)
    d = float(np.max(np.abs(got - ref)))
    print(f"LOCAL C={c}: max |delta| vs XLA local branch = {d:.3e}"
          f" ({'BITWISE' if d == 0 else 'close' if d < 1e-4 else 'DIVERGED'})",
          flush=True)


def run_gab(c: int, split: bool):
    """Compile + verify + the real WHOLE-BLOCK kernel (or split pair) at
    width C against the XLA graph_attention_block."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gastx.ops import graph as G
    from gastx.ops.pallas.fused_gab import (KERNEL_OPS, fused_gab,
                                            fused_gab_split)
    from gastx.ops.pallas.precision import resolve_tiers

    gp, gs, statics, cfg = _gab_level(c)
    sym = tuple(int(i) for i in statics.sym_idx)
    con = tuple(int(i) for i in statics.con_idx)
    with jax.default_matmul_precision(cfg.matmul_precision):
        precs = resolve_tiers(cfg.precision_for, KERNEL_OPS)
    fn = fused_gab_split if split else fused_gab
    name = "GAB-SPLIT" if split else "GAB"

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 25, 17, c)).astype(np.float32))
    t0 = time.perf_counter()
    got = jax.device_get(fn(x, gp, gs, sym, con, precs=precs))
    dt = time.perf_counter() - t0
    print(f"{name} C={c}: COMPILED+RAN in {dt:.1f}s", flush=True)

    with jax.default_matmul_precision(cfg.matmul_precision):
        ref, _ = jax.jit(functools.partial(
            G.graph_attention_block, statics=statics, train=False,
            dropout_rate=0.0, prec=cfg.precision_for))(x, gp, gs)
    ref = jax.device_get(ref)
    d = float(np.max(np.abs(got - ref)))
    print(f"{name} C={c}: max |delta| vs XLA block = {d:.3e}", flush=True)


def e2e(impl: str):
    """Full 27f eval-forward throughput with the given gab_impl."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gastx.models import config_for_frames, gastnet_forward, init_gastnet

    cfg = dataclasses.replace(config_for_frames(27, dropout=0.05),
                              gab_impl=impl)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    batch, iters = 1024, 30

    @jax.jit
    def many(params, state, x):
        def body(carry, _):
            xx = x + carry * 1e-12
            y, _ = gastnet_forward(params, state, xx, cfg,
                                   variant="dilated", train=False)
            return y.sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 27, 17, 2)).astype(
        np.float32))
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    print(f"E2E {impl}: compiled in {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    jax.device_get(many(params, state, x))
    dt = time.perf_counter() - t0
    print(f"E2E {impl}: {batch * iters / dt:.0f} seq/s", flush=True)


def err_pallas(impl: str = "pallas", frames: int = 27, seeds: int = 8):
    """End-to-end mm error of gab_impl=pallas vs the all-"highest" XLA
    forward over seeds (the perf_lab2/3/6 metric; budget 0.1 mm)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gastx.models import config_for_frames, gastnet_forward, init_gastnet

    mixed = dataclasses.replace(config_for_frames(frames, dropout=0.0),
                                gab_impl=impl)
    # The reference must be f32 storage: 81/243f configs default
    # storage_dtype="auto" (bf16 on TPU) since r3, and an inherited auto
    # would silently compare bf16 against bf16.
    exact = dataclasses.replace(mixed, matmul_precision="highest",
                                precision_overrides=(), gab_impl="xla",
                                storage_dtype="float32")

    @jax.jit
    def fwd_p(p, s, xx):
        return gastnet_forward(p, s, xx, mixed, variant="dilated",
                               train=False)[0]

    @jax.jit
    def fwd_e(p, s, xx):
        return gastnet_forward(p, s, xx, exact, variant="dilated",
                               train=False)[0]

    worst = 0.0
    for seed in range(seeds):
        params, state = init_gastnet(jax.random.PRNGKey(seed), mixed)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((64, frames, 17, 2)).astype(
            np.float32))
        d = float(jnp.max(jnp.abs(jax.device_get(fwd_p(params, state, x))
                                  - jax.device_get(fwd_e(params, state, x)))))
        worst = max(worst, d * 1000.0)
        print(f"  err[{impl} {frames}f] seed={seed}: {d*1000.0:.4f} mm",
              flush=True)
    print(f"ERR {impl} {frames}f: worst {worst:.4f} mm "
          f"({'WITHIN' if worst <= 0.1 else 'OVER'} 0.1mm budget)",
          flush=True)


def _sub(args, timeout):
    cmd = [sys.executable, __file__] + args
    print(f"\n=== {' '.join(args)} (timeout {timeout}s) ===", flush=True)
    t0 = time.perf_counter()
    try:
        r = subprocess.run(cmd, timeout=timeout)
        rc = r.returncode
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT after {timeout}s", flush=True)
        return False
    dt = time.perf_counter() - t0
    print(f"=== rc={rc} in {dt:.0f}s ===", flush=True)
    return rc == 0


def main():
    if "--probe" in sys.argv:
        probe(int(sys.argv[sys.argv.index("--probe") + 1]))
    elif "--local" in sys.argv:
        run_local(int(sys.argv[sys.argv.index("--local") + 1]))
    elif "--gab" in sys.argv:
        run_gab(int(sys.argv[sys.argv.index("--gab") + 1]), split=False)
    elif "--gab-split" in sys.argv:
        run_gab(int(sys.argv[sys.argv.index("--gab-split") + 1]), split=True)
    elif "--e2e-pallas" in sys.argv:
        e2e("pallas")
    elif "--err-pallas" in sys.argv:
        i = sys.argv.index("--err-pallas")
        frames = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 27
        seeds = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 8
        err_pallas("pallas", frames, seeds)
    elif "--e2e" in sys.argv:
        e2e("pallas_local")
        e2e("xla")
    elif "--gab-driver" in sys.argv:
        # The whole-block campaign (run when the Mosaic service is healthy):
        # compile each level's fused kernel, then the full forward.
        ok = _sub(["--gab", "128"], 2400)
        if ok:
            ok = _sub(["--gab", "256"], 2400)
        if ok:
            ok = _sub(["--gab-split", "512"], 2400)
        if ok:
            _sub(["--e2e-pallas"], 3600)
        print("\nperf_lab7 --gab-driver done", flush=True)
    else:
        ok128 = _sub(["--local", "128"], 1500)
        ok512 = ok128 and _sub(["--local", "512"], 1500)
        if ok128 and ok512:
            _sub(["--e2e"], 3600)
        if ok128:
            ok9 = _sub(["--probe", "9"], 1500)
            if ok9:
                ok12 = _sub(["--probe", "12"], 1500)
                if ok12:
                    _sub(["--probe", "15"], 1500)
        else:
            _sub(["--probe", "5"], 1500)
            _sub(["--probe", "4"], 1500)
        print("\nperf_lab7 driver done", flush=True)


if __name__ == "__main__":
    main()
