"""Temporal convolution primitives, channels-last.

The reference's temporal layers are torch ``Conv2d`` with kernels ``(fw, 1)``
over ``(B, C, T, N)`` — i.e. purely temporal, per-joint convolutions
(model/gast_net.py:130,145-148,207,222). On TPU we keep activations
channels-last ``(B, T, N, C)`` so the channel contraction lands on the MXU
lane dimension, and express the op with ``lax.conv_general_dilated``
(NHWC/HWIO), which XLA lowers to MXU matmuls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def temporal_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    dilation: int = 1,
    stride: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Valid (unpadded) temporal conv.

    ``x``: (B, T, N, Cin); ``w``: (fw, Cin, Cout). Returns (B, T', N, Cout)
    with T' = T - (fw-1)*dilation for stride 1, or the strided length.
    ``precision=None`` inherits the jax.default_matmul_precision context.
    """
    return jax.lax.conv_general_dilated(
        x,
        w[:, None, :, :],  # (fw, 1, Cin, Cout)
        window_strides=(stride, 1),
        padding="VALID",
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def pointwise(x: jnp.ndarray, w: jnp.ndarray, precision=None) -> jnp.ndarray:
    """1x1 conv == dense matmul over the channel axis.

    ``x``: (..., Cin); ``w``: (Cin, Cout).
    """
    return jnp.matmul(x, w, precision=precision)
