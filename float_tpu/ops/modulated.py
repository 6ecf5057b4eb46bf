"""Modulated (style-conditioned) convolution — the StyleGAN2 core op.

The reference implements per-sample weights via a grouped conv with
``groups=batch`` (reference: src/nodes/models/float/styledecoder.py:195-272),
a CUDA-centric trick that maps terribly onto the TPU MXU (it shatters one
large conv into B tiny ones).

TPU-native formulation ("input/output scaling"): modulation scales the conv
*input* per (batch, in-channel) and demodulation scales the conv *output* per
(batch, out-channel).  Because convolution is linear in both input and
weights these are mathematically identical to baking the style into the
weights, but the conv itself stays a single large batched NCHW convolution —
exactly what XLA tiles onto the MXU.  The demod norm is computed from the
closed form  demod[b,o] = rsqrt( sum_i (sum_k w[o,i,k]^2) * s[b,i]^2 + eps )
via one small einsum instead of materialising per-sample weights.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .equalized import equal_linear
from .upfirdn import make_blur_kernel, upfirdn2d

_EPS = 1e-8


def _modulation_style(style, mod_weight, mod_bias):
    """style (B, style_dim) -> per-input-channel scale (B, I).

    The modulation is an EqualLinear with bias_init=1
    (reference: styledecoder.py:229).
    """
    return equal_linear(style, mod_weight, mod_bias)


def modulated_conv2d(
    x: jnp.ndarray,              # (B, I, H, W)
    style: jnp.ndarray,          # (B, style_dim)
    weight: jnp.ndarray,         # (1, O, I, kH, kW) torch layout
    mod_weight: jnp.ndarray,     # (I, style_dim)
    mod_bias: jnp.ndarray,       # (I,)
    demodulate: bool = True,
    up: bool = False,
    down: bool = False,
    blur_kernel=(1, 3, 3, 1),
) -> jnp.ndarray:
    """StyleGAN2 ModulatedConv2d, einsum/scaling formulation.

    Matches reference ModulatedConv2d.forward (styledecoder.py:238-272):
    padding = k//2 for the plain path, conv_transpose(stride 2) + blur for
    ``up``, blur + stride-2 conv for ``down``.
    """
    b, in_c, h, w = x.shape
    _, out_c, _, kh, kw = weight.shape
    fan_in = in_c * kh * kw
    scale = 1.0 / math.sqrt(fan_in)

    s = _modulation_style(style, mod_weight, mod_bias)        # (B, I)
    w0 = weight[0]                                            # (O, I, kH, kW)

    if demodulate:
        # sum over kernel taps of w^2 -> (O, I); contract with s^2 -> (B, O)
        w2 = jnp.sum((w0.astype(jnp.float32) * scale) ** 2, axis=(2, 3))
        sig2 = jnp.einsum("oi,bi->bo", w2, (s.astype(jnp.float32)) ** 2)
        demod = jax.lax.rsqrt(sig2 + _EPS)                    # (B, O)

    # modulate input channels
    xm = x * (s * scale).astype(x.dtype)[:, :, None, None]

    cw = w0.astype(x.dtype)
    if up:
        # torch: F.conv_transpose2d(x, W^T(I,O,k,k), stride=2, padding=0)
        # == lhs-dilated correlation with the spatially-flipped W (OIHW).
        wt = jnp.flip(cw, (2, 3))
        out = jax.lax.conv_general_dilated(
            xm, wt,
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if demodulate:
            out = out * demod.astype(x.dtype)[:, :, None, None]
        # post-blur (reference: styledecoder.py:207-213,258)
        factor = 2
        p = (len(blur_kernel) - factor) - (kh - 1)
        pad0 = (p + 1) // 2 + factor - 1
        pad1 = p // 2 + 1
        k = make_blur_kernel(blur_kernel, upsample_factor=factor)
        out = upfirdn2d(out, k, pad=(pad0, pad1))
        return out

    if down:
        # pre-blur (reference: styledecoder.py:215-221,260)
        factor = 2
        p = (len(blur_kernel) - factor) + (kh - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        k = make_blur_kernel(blur_kernel)
        xm = upfirdn2d(xm, k, pad=(pad0, pad1))
        out = jax.lax.conv_general_dilated(
            xm, cw,
            window_strides=(2, 2),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if demodulate:
            out = out * demod.astype(x.dtype)[:, :, None, None]
        return out

    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        xm, cw,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if demodulate:
        out = out * demod.astype(x.dtype)[:, :, None, None]
    return out
