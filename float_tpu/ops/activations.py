"""Elementwise activation primitives.

TPU notes: these are VPU-bound elementwise ops; XLA fuses them into the
producing matmul/conv, so the jnp formulation is already "fused" on TPU.
The reference implements them as separate torch ops
(reference: src/nodes/models/float/encoder.py:13-14, styledecoder.py:12-13).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

LRELU_SCALE = math.sqrt(2.0)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = LRELU_SCALE,
) -> jnp.ndarray:
    """leaky_relu(x + bias) * scale — StyleGAN2's bias+act+gain op.

    ``bias`` broadcasts against ``x``: for NCHW feature maps pass shape
    (C,) and it is reshaped to (1, C, 1, 1); for (..., F) features pass (F,).
    """
    if bias is not None:
        if x.ndim == 4 and bias.ndim == 1:
            bias = bias.reshape(1, -1, 1, 1)
        x = x + bias
    return leaky_relu(x, negative_slope) * scale
