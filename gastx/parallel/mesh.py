"""Device mesh + sharding helpers.

The reference's only distribution mechanism is a 2-GPU
``nn.DataParallel`` scatter/gather (trainval.py:56-61). The TPU-native
equivalent (SURVEY.md §2.7) is SPMD data parallelism over an N-chip
``jax.sharding.Mesh``: batches are sharded on axis 0 along the ``data`` mesh
axis, parameters are replicated, and XLA emits the gradient/batch-stat
``psum`` collectives over ICI. No hand-written communication backend exists
or is needed — this module is the entire "distributed" layer.

Multi-host slices initialize via ``jax.distributed.initialize`` before
calling :func:`make_mesh` (JAX SPMD is multi-host-transparent).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX before building the mesh.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly elsewhere. After this, ``jax.devices()`` spans every
    host's chips and :func:`make_mesh` produces a pod-wide DP mesh — the
    train step itself is unchanged (SPMD is multi-host-transparent).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all visible devices (or a given list)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (the batch) across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DATA_AXIS):
    """Device-put host arrays with the batch axis sharded over the mesh.

    Pads the batch up to a multiple of the mesh size by repeating the last
    element (callers weight their loss by true count or use full batches).
    Returns (padded_arrays, true_batch_size).
    """
    n = mesh.devices.size
    sharding = batch_sharding(mesh, axis_name)
    out = []
    true_b = None
    for arr in arrays:
        if arr is None:
            out.append(None)
            continue
        arr = np.asarray(arr)
        if true_b is None:
            true_b = arr.shape[0]
        rem = (-arr.shape[0]) % n
        if rem:
            arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)])
        out.append(jax.device_put(arr, sharding))
    return out, true_b


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
