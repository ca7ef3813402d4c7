"""Explicit matmul-precision control inside Pallas kernels.

``gastnet_forward`` pins ``jax.default_matmul_precision(cfg.matmul_precision)``
around the whole forward, and that ambient tier leaks into the jaxpr of any
``pallas_call`` traced under it. Mosaic supports DEFAULT and HIGHEST dots but
rejects HIGH ("Unsupported dot precision: HIGH"), so every dot inside a kernel
must carry an explicit precision. ``kdot``/``kdot_general`` map the model's
per-op precision-tier strings (GastNetConfig.matmul_precision /
precision_overrides) onto Mosaic-compilable dots:

  "default"  -> one bf16 x bf16 -> f32 MXU pass (Precision.DEFAULT)
  "high"     -> 3-pass error-compensated bf16 product — the same algorithm
                XLA:TPU uses for HIGH: with a = ah + al (ah = bf16(a)),
                a@b ~= ah@bh + ah@bl + al@bh
  "high_lhs" -> 2-pass, lhs compensated: ah@bh + al@bh == a@bh exactly —
                the lhs (activations) keeps full f32 precision, only the
                rhs (weights) is rounded to bf16. 2/3 the MXU passes of
                "high"; KERNEL-ONLY (XLA has no such tier — the model
                maps it to "high" on XLA paths, see
                gastx/models/config.py xla_precision).
  "high_rhs" -> 2-pass, rhs compensated: ah@bh + ah@bl == ah@b — weights
                exact, activations rounded. KERNEL-ONLY, as above.
  "kdefault" -> one bf16 pass, identical to "default" IN-KERNEL; the
                model maps it to "high" on XLA sites. This is how the
                243f loosening ships (config_for_frames): only dots that
                execute inside kernels are loosened — train-mode and
                non-TPU XLA fallbacks keep their certified 3-pass dots.
  "highest"  -> Precision.HIGHEST (6-pass)

With ``interpret=True`` the "high" emulation is skipped (plain HIGHEST dot):
interpret mode runs f32 on CPU where XLA's tiers are all exact anyway, so
interpret parity tests stay bit-tight against the XLA path — mirroring XLA's
own platform-dependent tier semantics.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp


def resolve_tiers(prec_fn: Callable[[str], Optional[str]],
                  ops: Iterable[str]) -> Tuple[Tuple[str, str], ...]:
    """Resolve per-op precision tiers for a kernel at its call site.

    ``prec_fn`` is the model's per-op-class resolver (None = no override);
    unresolved ops inherit the ambient ``jax.default_matmul_precision``
    context ("default" when unset — XLA's own fallback). If the resolver
    carries a ``.kernel_raw`` attribute (the model's XLA-safe resolvers
    do), that unmapped form is used so kernel-only tiers
    ("high_lhs"/"high_rhs") reach the kernels instead of their "high"
    XLA mapping.
    """
    raw = getattr(prec_fn, "kernel_raw", prec_fn)
    base = jax.config.jax_default_matmul_precision or "default"
    return tuple((op, raw(op) or base) for op in ops)


def tiers_from_pairs(precs: Tuple[Tuple[str, str], ...],
                     ops: Iterable[str]) -> dict:
    """((op, tier), ...) static pairs -> complete per-op dict; ops missing
    from ``precs`` inherit the ambient default_matmul_precision (kernel-side
    counterpart of resolve_tiers)."""
    base = jax.config.jax_default_matmul_precision or "default"
    tiers = {op: base for op in ops}
    tiers.update(dict(precs))
    return tiers


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_EMULATED = ("high", "high_lhs", "high_rhs")
# Every tier kdot understands; anything else is a config typo that would
# otherwise silently run 1-pass via the DEFAULT fallback.
_KNOWN_TIERS = _EMULATED + ("default", "kdefault", "highest")


def _check_tier(tier: str) -> None:
    if tier not in _KNOWN_TIERS:
        raise ValueError(
            f"unknown kernel precision tier {tier!r}; valid: {_KNOWN_TIERS}")


def _emulated(d, a, b, tier):
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    if tier == "high_lhs":
        return d(ah, bh) + d(al, bh)
    if tier == "high_rhs":
        return d(ah, bh) + d(ah, bl)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def kdot(a, b, tier: str = "default", *, interpret: bool = False):
    """2-D ``jnp.dot`` with an explicit Mosaic-supported precision tier."""
    _check_tier(tier)
    if tier in _EMULATED and not interpret:
        def d(u, v):
            return jnp.dot(u, v, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        return _emulated(d, a, b, tier)
    p = (jax.lax.Precision.HIGHEST if tier in _EMULATED + ("highest",)
         else jax.lax.Precision.DEFAULT)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=p)


def kdot_general(a, b, dims, tier: str = "default", *,
                 interpret: bool = False):
    """``jax.lax.dot_general`` with an explicit precision tier."""
    _check_tier(tier)
    if tier in _EMULATED and not interpret:
        def d(u, v):
            return jax.lax.dot_general(
                u, v, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        return _emulated(d, a, b, tier)
    p = (jax.lax.Precision.HIGHEST if tier in _EMULATED + ("highest",)
         else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32,
                               precision=p)
