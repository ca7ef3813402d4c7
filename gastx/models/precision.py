"""Mixed-precision helpers.

fp32 is the parity mode (<=0.1mm vs the reference). bfloat16 halves HBM
traffic and engages the MXU's native bf16 path — the forward is memory-bound
at production batch sizes, so this is close to a 2x throughput lever. The
model's ops all follow input dtypes, so casting params + inputs is the whole
switch; outputs are returned in fp32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def bf16_inference_fn(forward_fn):
    """Wrap an (params, state, x) -> y forward into a bf16 compute / fp32
    boundary version."""
    def wrapped(params, state, x):
        params16 = cast_floating(params, jnp.bfloat16)
        state16 = cast_floating(state, jnp.bfloat16)
        y = forward_fn(params16, state16, x.astype(jnp.bfloat16))
        return y.astype(jnp.float32)

    return wrapped
