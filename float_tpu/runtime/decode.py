"""Frame-batched streaming decode — the throughput-critical stage.

The reference decodes frame-by-frame with B=1 and a per-frame GPU->CPU copy
(reference: src/nodes/models/float/FLOAT.py:113-169).  TPU-native design:

- frames are decoded in batches of ``decode_batch`` so every modulated conv
  is one large MXU op,
- ONE jitted chunk program is reused across the whole clip (python-level
  chunk loop: dispatch overhead is micro-seconds per ~milliseconds of
  compute, and the decoded chunks stream out as they finish — the
  long-video memory behavior the reference's streamed decode targets),
- the [0,1] conversion and HWC permute happen on device; frames are
  device-side concatenated and transferred once by the caller.

(A ``lax.scan`` formulation was measured to explode XLA:CPU compile time on
the synthesis body; the chunked-jit design compiles once and behaves
identically on TPU.)
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.synthesis import synthesis


@partial(jax.jit, static_argnames=("size",))
def _decode_chunk(params, wa_chunk, feats, size):
    """(fb, dim_w) latents -> (fb, S, S, 3) float32 frames in [0, 1]."""
    img, _ = synthesis(params, wa_chunk, feats, size)
    img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
    img = (img + 1.0) * 0.5
    return jnp.transpose(img, (0, 2, 3, 1))


def decode_latents(
    synthesis_params,
    s_r: jnp.ndarray,          # (1, dim_w) appearance latent
    feats: list,               # 7 skip maps, each (1, C, H, W)
    r_d: jnp.ndarray,          # (T, dim_w) motion latents
    *,
    size: int,
    decode_batch: int = 8,
    compute_dtype=jnp.float32,
    frame_callback=None,       # optional fn(chunk_idx, n_chunks) progress hook
) -> jnp.ndarray:
    """Decode T frames -> (T, size, size, 3) float32 in [0, 1].

    Assumes the reference's B=1 contract (FLOAT.py:119); frame batching
    replaces the reference's per-frame loop.
    """
    t_frames = r_d.shape[0]
    fb = decode_batch
    n_chunks = math.ceil(t_frames / fb)
    t_pad = n_chunks * fb

    dtype = jnp.dtype(compute_dtype)
    wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    if t_pad != t_frames:
        wa = jnp.pad(wa, ((0, t_pad - t_frames), (0, 0)), mode="edge")

    feats_c = [f.astype(dtype) for f in feats]
    params_c = jax.tree.map(lambda a: a.astype(dtype), synthesis_params)

    chunks = []
    for ci in range(n_chunks):
        chunks.append(_decode_chunk(params_c, wa[ci * fb:(ci + 1) * fb],
                                    feats_c, size))
        if frame_callback is not None:
            frame_callback(ci, n_chunks)
    frames = jnp.concatenate(chunks, axis=0)
    return frames[:t_frames]
