"""Quaternion rotation primitives.

Parity target: reference ``common/quaternion.py:4-35`` (qort/qinverse), rebuilt
as pure jax.numpy functions usable on host (CPU backend) and inside jit.

Quaternions are ``(..., 4)`` arrays ``[w, x, y, z]`` assumed unit-norm.
"""
from __future__ import annotations

import jax.numpy as jnp


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``.

    ``q``: (..., 4), ``v``: (..., 3) with broadcast-compatible leading dims.
    Uses the cross-product identity ``v' = v + 2*(w*(qv×v) + qv×(qv×v))``.
    """
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    assert q.shape[-1] == 4
    assert v.shape[-1] == 3

    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qinverse(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (its inverse)."""
    q = jnp.asarray(q)
    assert q.shape[-1] == 4
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
