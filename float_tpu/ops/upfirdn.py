"""upfirdn2d — upsample / FIR filter / downsample, the StyleGAN2 resampling op.

Behavioral contract matches the reference's pure-PyTorch fallback
(reference: src/nodes/models/float/encoder.py:17-37), which is:

    1. zero-insert upsample by ``up`` (zeros *after* each sample, so the
       upsampled length is ``in * up`` including trailing zeros),
    2. pad by (pad0, pad1) per spatial dim (negative pads crop),
    3. correlate with the flipped 2-D FIR kernel (i.e. convolve with the
       kernel),
    4. keep every ``down``-th output pixel.

TPU-native formulation: one ``lax.conv_general_dilated`` call per invocation.
``lhs_dilation`` performs the zero-insertion (it inserts ``up-1`` zeros
*between* samples, so the reference's trailing zeros are folded into the
high-side padding), the conv padding absorbs pad0/pad1 (XLA supports negative
padding natively), and ``window_strides`` performs the decimation.  The FIR
kernel is depthwise (feature_group_count = C) which XLA maps onto the VPU/MXU
without materialising any intermediate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _make_blur_kernel_np(k: tuple, upsample_factor: int = 1) -> np.ndarray:
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    if upsample_factor > 1:
        k = k * (upsample_factor ** 2)
    return k


def make_blur_kernel(k, upsample_factor: int = 1) -> jnp.ndarray:
    """Normalized separable-outer-product blur kernel.

    Mirrors ``make_kernel`` (reference: encoder.py:40-45) including the
    ``factor**2`` gain used for upsampling blurs.
    """
    return jnp.asarray(_make_blur_kernel_np(tuple(k), upsample_factor))


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Apply upfirdn to an NCHW tensor with a 2-D FIR kernel.

    Matches reference semantics: ``pad`` = (pad0, pad1) applied to both
    spatial dims; the kernel is spatially flipped before correlation.
    """
    pad0, pad1 = pad
    n, c, h, w = x.shape
    kh, kw = kernel.shape

    # The reference zero-inserts AFTER each sample: length in*up.  With
    # lhs_dilation (zeros BETWEEN samples: length (in-1)*up+1) the missing
    # (up-1) trailing zeros are added to the high-side pad.
    pad_hi = pad1 + (up - 1)

    # Flip kernel: torch's F.conv2d(x, flip(k)) == correlate with flip(k).
    # lax.conv_general_dilated is also a correlation, so flip here too.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    # Depthwise: one shared FIR kernel per channel.
    k = jnp.broadcast_to(k[None, None], (c, 1, kh, kw))

    out = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((pad0, pad_hi), (pad0, pad_hi)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return out


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad: tuple[int, int]) -> jnp.ndarray:
    """FIR blur, no resampling (reference Blur module, encoder.py:60-74)."""
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


def upsample2x(x: jnp.ndarray, blur_kernel=(1, 3, 3, 1)) -> jnp.ndarray:
    """2x upsample with FIR smoothing (reference Upsample, styledecoder.py:74-90)."""
    factor = 2
    kernel = make_blur_kernel(blur_kernel, upsample_factor=factor)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1))


def downsample2x(x: jnp.ndarray, blur_kernel=(1, 3, 3, 1)) -> jnp.ndarray:
    """2x downsample with FIR anti-aliasing (reference Downsample, styledecoder.py:93-109)."""
    factor = 2
    kernel = make_blur_kernel(blur_kernel)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))
