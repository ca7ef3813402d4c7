"""Once-per-round probes of the Mosaic-blocked paths (VERDICT r3 item 7).

Three documented blockers, each worth one compile attempt per round in
case the remote compile service / libtpu image moved:

  1. local AOT (PALLAS_AXON_REMOTE_COMPILE=0): r3 failed with a libtpu
     version mismatch (client Jan-2026 vs terminal Nov-2025). Probed in a
     SUBPROCESS because the env var is read at backend init.
  2. joint-packed (B, T, J*C) layout (fused_gab_packed): Mosaic rejects
     the lane->sublane shape cast. Unblocking it is the documented ~2x
     narrow-arch lever (DESIGN.md "Packed narrow-level layout").
  3. gab_apply_block=True blocked apply dot: remote service HTTP 500
     (perf_lab22); interpret-verified, ~8ms lever at 27f.

Each probe prints one PASS/BLOCKED line; update CLAUDE.md with the
results.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_blocked.py
"""
from __future__ import annotations

import os
import subprocess
import sys

_CHILD_LOCAL_AOT = r"""
import jax, jax.numpy as jnp, numpy as np
from gastx.models import graph_statics, GastNetConfig
from gastx.models.init import init_gastnet
from gastx.ops.pallas.fused_gab import fused_gab, KERNEL_OPS
from gastx.ops.pallas.precision import resolve_tiers
cfg = GastNetConfig(filter_widths=(3, 3), channels=32, dropout=0.0)
params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
st = graph_statics(cfg.layout)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (4, 9, 17, 32)).astype(np.float32))
y = fused_gab(x, params["gabs"][0], state["gabs"][0],
              tuple(int(i) for i in st.sym_idx),
              tuple(int(i) for i in st.con_idx),
              )
print("LOCAL-AOT-OK", jax.device_get(y).shape)
"""


def probe_local_aot():
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="0",
               PYTHONPATH="/root/repo:/root/.axon_site")
    r = subprocess.run([sys.executable, "-c", _CHILD_LOCAL_AOT], env=env,
                       capture_output=True, text=True, timeout=1200)
    ok = "LOCAL-AOT-OK" in r.stdout
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    print(f"[probe 1: local AOT] {'PASS' if ok else 'BLOCKED'}:",
          " | ".join(t[:160] for t in tail), flush=True)


def probe_packed():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gastx.models import GastNetConfig, graph_statics
    from gastx.models.init import init_gastnet
    from gastx.ops.pallas.fused_gab import fused_gab_packed

    cfg = GastNetConfig(filter_widths=(3, 3), channels=32, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    st = graph_statics(cfg.layout)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 9, 17 * 32)).astype(np.float32))
    try:
        y = fused_gab_packed(x, params["gabs"][0], state["gabs"][0], 17,
                             tuple(int(i) for i in st.sym_idx),
                             tuple(int(i) for i in st.con_idx))
        print("[probe 2: joint-packed layout] PASS:",
              jax.device_get(y).shape, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[probe 2: joint-packed layout] BLOCKED: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def probe_apply_block():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gastx.models import GastNetConfig, graph_statics
    from gastx.models.init import init_gastnet
    from gastx.ops.pallas.fused_gab import fused_gab

    cfg = GastNetConfig(filter_widths=(3, 3), channels=128, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    st = graph_statics(cfg.layout)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 9, 17, 128)).astype(np.float32))
    try:
        y = fused_gab(x, params["gabs"][0], state["gabs"][0],
                      tuple(int(i) for i in st.sym_idx),
                      tuple(int(i) for i in st.con_idx),
                      apply_block=True)
        print("[probe 3: gab_apply_block] PASS:", jax.device_get(y).shape,
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[probe 3: gab_apply_block] BLOCKED: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    probe_local_aot()
    probe_packed()
    probe_apply_block()
