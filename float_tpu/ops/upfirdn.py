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


# ---------------------------------------------------------------------------
# MXU formulation: upfirdn as two banded-matrix einsums
#
# The blur kernels are separable (outer(k, k)), so 2-D upfirdn factors into
# two 1-D upfirdns, and a 1-D upfirdn is a banded linear map — a matmul.
# The depthwise-conv lowering runs on the VPU at C-lane occupancy (C=3 RGB
# skips waste 125/128 lanes; even C=32 blurs measured 9 ms per 16-frame
# chunk level); the band matmul rides the otherwise-idle MXU instead
# (measured ~6-40x faster depending on C).  Exact same semantics: the
# matrix is built by running the reference 1-D upfirdn on an identity.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _upfirdn1d_matrix_np(n: int, k: tuple, up: int, down: int,
                         pad0: int, pad1: int) -> np.ndarray:
    """(out_len, n) matrix M with (M @ x) == upfirdn1d(x, k, up, down, pad)."""
    k = np.asarray(k, dtype=np.float64)
    eye = np.eye(n, dtype=np.float64)
    # zero-stuff AFTER each sample (reference semantics): length n*up
    y = np.zeros((n * up, n))
    y[::up] = eye
    # pad (negative pads crop)
    if pad0 >= 0:
        y = np.concatenate([np.zeros((pad0, n)), y], axis=0)
    else:
        y = y[-pad0:]
    if pad1 >= 0:
        y = np.concatenate([y, np.zeros((pad1, n))], axis=0)
    elif pad1 < 0:
        y = y[:pad1]
    # correlate with flip(k) == convolve with k
    kh = len(k)
    out_len = y.shape[0] - kh + 1
    m = np.zeros((out_len, n))
    kf = k[::-1]
    for t in range(kh):
        m += kf[t] * y[t:t + out_len]
    return m[::down].astype(np.float32)


def _axis_matrix(n: int, k1d: tuple, up: int, down: int,
                 pad: tuple[int, int], axis_gain: float) -> np.ndarray:
    """Per-axis 1-D factor of the separable 2-D blur kernel.

    ``axis_gain`` is this axis's share of the 2-D kernel gain (the 2x
    upsample kernels carry a total gain of factor², i.e. factor per axis).
    """
    k = np.asarray(k1d, dtype=np.float64)
    k = k / k.sum() * axis_gain
    return _upfirdn1d_matrix_np(n, tuple(float(v) for v in k), up, down,
                                pad[0], pad[1])


def upfirdn2d_mxu(x_nhwc: jnp.ndarray, k1d, up: int = 1, down: int = 1,
                  pad: tuple[int, int] = (0, 0),
                  kernel_gain: float = 1.0) -> jnp.ndarray:
    """Separable upfirdn on an NHWC tensor via two band-matrix einsums.

    Exact (matrix built from the op's own 1-D semantics); runs on the MXU.
    ``kernel_gain`` is the total 2-D kernel gain (make_blur_kernel's
    upsample_factor² — split evenly across the axes here).
    """
    h, w = x_nhwc.shape[1], x_nhwc.shape[2]
    axis_gain = float(kernel_gain) ** 0.5
    mw = jnp.asarray(_axis_matrix(w, tuple(k1d), up, down, pad, axis_gain))
    mh = mw if h == w else jnp.asarray(
        _axis_matrix(h, tuple(k1d), up, down, pad, axis_gain))
    y = jnp.einsum("bhwc,vw->bhvc", x_nhwc, mw.astype(x_nhwc.dtype),
                   preferred_element_type=jnp.float32).astype(x_nhwc.dtype)
    return jnp.einsum("bhwc,uh->buwc", y, mh.astype(x_nhwc.dtype),
                      preferred_element_type=jnp.float32).astype(x_nhwc.dtype)


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
