"""One JAX process of an N-process CPU 'pod' (tests/test_multihost.py).

Executes the golden-loss DP step of test_train.test_data_parallel_equivalence
over a mesh spanning ALL processes' devices — the first actual execution of
``gastx.parallel.mesh.init_distributed`` (SURVEY.md §2.7 "multi-host-capable
for free"; reference generalization point: trainval.py:56-61). Process 0
dumps loss + flattened gradients to an npz the parent compares across
process counts.

Usage: python tests/multihost_child.py PROC_ID NPROC DEVS_PER_PROC PORT OUT
(OUT = "-" to skip dumping; only process 0 writes.)
"""
from __future__ import annotations

import sys


def main() -> None:
    proc_id, nproc, devs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    port, out = sys.argv[4], sys.argv[5]

    import jax

    # Same environment taming as tests/conftest.py, before any backend init:
    # the site config pins jax_platforms=axon,cpu and ignores JAX_PLATFORMS.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devs)
    if nproc > 1:
        # Cross-process CPU collectives need a real implementation (the
        # default 'none' only supports single-process meshes).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import jax.numpy as jnp
    import numpy as np

    from gastx.models import GastNetConfig, gastnet_forward, init_gastnet
    from gastx.parallel.mesh import (batch_sharding, init_distributed,
                                     make_mesh, replicated_sharding)

    if nproc > 1:
        init_distributed(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=proc_id)
    assert len(jax.devices()) == nproc * devs, jax.devices()

    cfg = GastNetConfig(num_joints_in=15, num_joints_out=15,
                        filter_widths=(3, 3), channels=8, dropout=0.0,
                        layout="humaneva15")
    params, bn_state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    rf = cfg.receptive_field()
    x2d = rng.standard_normal((8, rf, 15, 2)).astype(np.float32)
    x3d = rng.standard_normal((8, 1, 15, 3)).astype(np.float32)
    w = np.ones((8,), np.float32)

    def loss_fn(p, bs, b2, b3, wts):
        pred, _ = gastnet_forward(p, bs, b2, cfg, variant="strided",
                                  train=True, rng=jax.random.PRNGKey(0))
        target = b3.at[:, :, 0].set(0.0)
        err = jnp.mean(jnp.linalg.norm(pred - target, axis=-1), axis=(1, 2))
        return jnp.sum(err * wts) / jnp.sum(wts)

    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    def gput(arr, sharding):
        # Multi-controller-safe device_put: every process materializes its
        # addressable shards from the (identical) host copy.
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    with mesh:
        loss, grads = grad_fn(
            jax.tree_util.tree_map(lambda a: gput(a, rsh), params),
            jax.tree_util.tree_map(lambda a: gput(a, rsh), bn_state),
            gput(x2d, bsh), gput(x3d, bsh), gput(w, bsh))
    loss = float(loss)  # replicated scalar: addressable everywhere
    leaves = [np.asarray(jax.device_get(g))
              for g in jax.tree_util.tree_leaves(grads)]
    print(f"MULTIHOST-CHILD proc={proc_id}/{nproc} loss={loss:.8f} "
          f"leaves={len(leaves)}", flush=True)
    if out != "-" and proc_id == 0:
        np.savez(out, loss=np.float64(loss),
                 **{f"g{i}": g for i, g in enumerate(leaves)})


if __name__ == "__main__":
    main()
