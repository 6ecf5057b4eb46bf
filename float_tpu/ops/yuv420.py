"""YUV 4:2:0 wire codec — halves device->host frame-transfer bytes.

The reference hands frames to the host as full float32 RGB, one frame at
a time (reference: src/nodes/models/float/FLOAT.py:113-169).  This
framework already ships uint8 RGB (4x less); for DELIVERY paths whose
final encoding is chroma-subsampled anyway (JPEG streams and every video
codec consume 4:2:0), the device converts to planar YCbCr 4:2:0 first:
1.5 bytes/pixel instead of 3 — 2x fewer wire bytes at zero quality cost
relative to the downstream JPEG/mp4, since those discard the same chroma
resolution.  On a bandwidth-constrained host link (the ~17 MB/s dev
tunnel; PCIe contention in production serving) this doubles sustained
delivered frames/s.

Matrix: BT.601 full-range (JFIF) — the same one JPEG uses, so the
host-side inverse (``i420_to_rgb_u8``) + cv2 JPEG encode is equivalent
to encoding the device's RGB directly.

Packed layout (per frame, H and W even): ``(H*3//2, W)`` uint8 —
Y plane (H, W) on top, then Cb (H//2, W//2) and Cr (H//2, W//2) side by
side in the bottom (H//2, W) block.  Self-inverse pair below; the host
inverse is vectorized numpy over a whole chunk (~1 GB/s, never the
bottleneck next to the wire).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# JFIF / BT.601 full-range forward constants
_KR, _KG, _KB = 0.299, 0.587, 0.114
_CB_SCALE = 0.5 / (1.0 - _KB)     # 0.564334...
_CR_SCALE = 0.5 / (1.0 - _KR)     # 0.713267...


def rgb01_to_i420(img: jnp.ndarray) -> jnp.ndarray:
    """Device-side: (fb, H, W, 3) float32 RGB in [0,1] -> (fb, H*3//2, W)
    uint8 planar 4:2:0.  H and W must be even (every model size is a
    power of two).  Chroma is 2x2 box-averaged BEFORE quantization."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = _KR * r + _KG * g + _KB * b
    cb = 0.5 + (b - y) * _CB_SCALE
    cr = 0.5 + (r - y) * _CR_SCALE
    fb, h, w = y.shape
    cb = cb.reshape(fb, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = cr.reshape(fb, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def q(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    chroma = jnp.concatenate([q(cb), q(cr)], axis=2)     # (fb, H//2, W)
    return jnp.concatenate([q(y), chroma], axis=1)


def i420_to_rgb_u8(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse: (T, H*3//2, W) uint8 -> (T, H, W, 3) uint8 RGB.
    Chroma upsamples by pixel replication (the JPEG-decoder convention);
    exact inverse of ``rgb01_to_i420`` up to quantization + subsampling."""
    packed = np.asarray(packed)
    squeeze = packed.ndim == 2
    if squeeze:
        packed = packed[None]
    t, h15, w = packed.shape
    h = (h15 * 2) // 3
    y = packed[:, :h].astype(np.float32)
    cb = packed[:, h:, : w // 2].astype(np.float32) - 127.5
    cr = packed[:, h:, w // 2:].astype(np.float32) - 127.5
    cb = cb.repeat(2, axis=1).repeat(2, axis=2)
    cr = cr.repeat(2, axis=1).repeat(2, axis=2)
    out = np.empty((t, h, w, 3), np.float32)
    out[..., 0] = y + (1.0 / _CR_SCALE) * cr
    out[..., 1] = y - (_KB / _KG / _CB_SCALE) * cb \
        - (_KR / _KG / _CR_SCALE) * cr
    out[..., 2] = y + (1.0 / _CB_SCALE) * cb
    np.clip(out, 0.0, 255.0, out=out)
    out = (out + 0.5).astype(np.uint8)
    return out[0] if squeeze else out
