"""Equalized-learning-rate linear / conv primitives (StyleGAN2).

Weights are stored in torch layout — Linear: (out, in); Conv2d: (O, I, kH, kW)
— so checkpoint pytrees load with zero transposition bookkeeping.  The
runtime-scale trick (weight * 1/sqrt(fan_in)) matches the reference
(reference: src/nodes/models/float/encoder.py:87-140).

TPU notes: the scale folds into the conv/matmul constant-wise and XLA hoists
it; all matmuls request f32 accumulation via ``preferred_element_type`` so
bf16 inputs still accumulate at full precision on the MXU.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .activations import fused_leaky_relu


def equal_linear(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    lr_mul: float = 1.0,
    activation: bool = False,
) -> jnp.ndarray:
    """y = x @ (w * scale)^T (+ bias*lr_mul), optional fused-lrelu activation.

    weight: (out, in) torch layout. scale = lr_mul / sqrt(in).
    Mirrors EqualLinear (reference: encoder.py:113-137).
    """
    in_dim = weight.shape[1]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = (weight * scale).astype(x.dtype)
    out = jnp.einsum("...i,oi->...o", x, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    b = None if bias is None else (bias * lr_mul).astype(x.dtype)
    if activation:
        return fused_leaky_relu(out, b)
    if b is not None:
        out = out + b
    return out


def equal_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """NCHW conv with runtime weight scale 1/sqrt(I*kH*kW).

    weight: (O, I, kH, kW) torch layout.
    Mirrors EqualConv2d (reference: encoder.py:87-104).
    """
    o, i, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(i * kh * kw)
    w = (weight * scale).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1).astype(x.dtype)
    return out
