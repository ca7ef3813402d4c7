"""Test config: force the JAX CPU backend with 8 virtual devices so sharding
tests run without TPU hardware and results are host-deterministic.

Note: this host's site config pins ``jax_platforms=axon,cpu`` and *overrides*
the JAX_PLATFORMS env var, so we must force the config flag programmatically
before any backend is initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
