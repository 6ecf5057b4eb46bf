"""Chunked autoregressive flow-matching sampling — the generation hot loop.

Re-design of the reference's per-chunk ODE loop
(reference: src/nodes/models/float/FLOAT.py:171-253 and the shared helper
src/nodes/nodes_adv.py:545-694) as a single ``lax.scan`` over chunks with an
inner fixed-step ODE scan, all inside one jit program:

    carry = (prev_x, prev_wa, prev_we)      # 10-frame autoregressive state
    per chunk:  x0 ~ N(0, I) (B, 50, dim_w)
                r_d_chunk = ODE(fmt_cfg_vector_field, x0, linspace(0,1,nfe))
                carry <- last 10 frames of (r_d_chunk, wa_chunk, we_chunk)

Shapes are fully static: the caller pads wa/we to n_chunks*frames_per_clip
(edge replicate — reference FLOAT.py:226-227) and trims the result to T.
Chunks are inherently sequential (autoregressive conditioning, SURVEY §5.7);
parallelism comes from the batch dim and the CFG 3/4-way batch.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import FloatConfig
from ..models.fmt import fmt_forward_cfg
from ..ops import odeint_fixed


def pad_to_chunks(x: jnp.ndarray, frames_per_clip: int,
                  n_chunks: Optional[int] = None) -> jnp.ndarray:
    """Right-pad (B, T, D) along T to a multiple of frames_per_clip with edge
    replication (parity with F.pad mode='replicate').  ``n_chunks`` pads
    to a larger chunk count (shape bucketing)."""
    t = x.shape[1]
    target = (n_chunks if n_chunks is not None
              else math.ceil(t / frames_per_clip)) * frames_per_clip
    if target == t:
        return x
    return jnp.pad(x, ((0, 0), (0, target - t), (0, 0)), mode="edge")


def bucket_n_chunks(n: int) -> int:
    """Round a chunk count up to its compilation bucket: 1..5 exact, then
    multiples of 5 (10 s of audio at the default 2 s chunks).

    Padded chunks trail the real ones, so the autoregressive scan computes
    the real chunks IDENTICALLY and the caller trims — bucketing is
    exact, it only trades ≤20%% wasted sampling compute for program reuse
    (a 60 s clip reuses the 60 s bucket instead of compiling per length).
    """
    if n <= 5:
        return n
    return math.ceil(n / 5) * 5


def sample_motion_chunk(
    fmt_params,
    r_s: jnp.ndarray,                  # (B, dim_w)
    wa_t: jnp.ndarray,                 # (B, clip, dim_a) this chunk's audio
    we_t: jnp.ndarray,                 # (B, 1, E) static | (B, clip, E) dyn
    carry,                             # (prev_x, prev_wa, prev_we)
    x0: jnp.ndarray,                   # (B, clip, dim_w) chunk noise
    *,
    cfg: FloatConfig,
    a_cfg_scale, e_cfg_scale, r_cfg_scale,
    nfe: int, ode_method: str, cfg_mode: str,
):
    """ONE autoregressive chunk of the CFG-ODE sampler.

    The python-level per-chunk form of ``sample_motion_latents``'s scan
    body — identical math (same field, same carry contract) so a chunked
    caller (runtime streaming mode: decode chunk c while integrating
    chunk c+1) produces the same latents as the one-scan program.
    Returns (sample_t (B, clip, dim_w), new_carry).
    """
    prev = cfg.num_prev_frames
    dynamic = we_t.shape[1] > 1
    prev_x, prev_wa, prev_we = carry
    fmt_kw = dict(depth=cfg.fmt_depth, num_heads=cfg.num_heads,
                  attention_window=cfg.attention_window)
    cfg_kw = dict(a_cfg_scale=a_cfg_scale, e_cfg_scale=e_cfg_scale,
                  r_cfg_scale=r_cfg_scale, include_r_cfg=cfg.include_r_cfg,
                  cfg_mode=cfg_mode)

    def field(tt, zt):
        out = fmt_forward_cfg(
            fmt_params, jnp.reshape(tt, (1,)), zt, wa_t, r_s, we_t,
            prev_x, prev_wa,
            prev_we if dynamic else None,
            **cfg_kw, **fmt_kw)
        return out[:, prev:]

    time_grid = jnp.linspace(0.0, 1.0, nfe)
    sample_t = odeint_fixed(field, x0, time_grid, method=ode_method)
    new_prev_we = we_t[:, -prev:] if dynamic else prev_we
    return sample_t, (sample_t[:, -prev:], wa_t[:, -prev:], new_prev_we)


def sampler_init_carry(b: int, cfg: FloatConfig, dtype=jnp.float32):
    """Zero autoregressive carry (prev_x, prev_wa, prev_we) for chunk 0."""
    prev = cfg.num_prev_frames
    return (jnp.zeros((b, prev, cfg.dim_w), dtype),
            jnp.zeros((b, prev, cfg.dim_w), dtype),
            jnp.zeros((b, prev, cfg.dim_e), dtype))


def chunk_noise(key, c: int, b: int, cfg: FloatConfig, dtype=jnp.float32):
    """Chunk c's noise — the same (key, c) fold_in the scan sampler uses,
    so streamed and one-scan sampling share noise exactly.

    Always DRAWN in f32 then cast: jax.random.normal samples different
    values per dtype, so drawing in the compute dtype would change the
    trajectory (not just its rounding) under sampler_dtype=bfloat16."""
    return jax.random.normal(jax.random.fold_in(key, c),
                             (b, cfg.num_frames_for_clip, cfg.dim_w),
                             dtype=jnp.float32).astype(dtype)


def sample_motion_latents(
    fmt_params,
    r_s: jnp.ndarray,                 # (B, dim_w)
    wa: jnp.ndarray,                  # (B, T, dim_a)
    we: jnp.ndarray,                  # (B, 1, E) static | (B, T, E) dynamic
    *,
    cfg: FloatConfig,
    a_cfg_scale: Optional[float] = None,
    e_cfg_scale: Optional[float] = None,
    r_cfg_scale: Optional[float] = None,
    nfe: Optional[int] = None,
    ode_method: Optional[str] = None,
    cfg_mode: Optional[str] = None,        # 'skip'|'3way'|'4way'; static
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,   # (n_chunks, B, clip, dim_w) override
) -> jnp.ndarray:
    """Generate motion latents r_d (B, T, dim_w) for T = wa.shape[1] frames.

    Either ``key`` (JAX PRNG; per-chunk noise via fold_in) or explicit
    ``noise`` must be given — the latter enables bit-level parity harnesses
    against recorded torch noise.

    CFG scales may be traced arrays when ``cfg_mode`` is given explicitly
    (so scale changes don't trigger recompilation).
    """
    a_s = cfg.a_cfg_scale if a_cfg_scale is None else a_cfg_scale
    e_s = cfg.e_cfg_scale if e_cfg_scale is None else e_cfg_scale
    r_s_scale = cfg.r_cfg_scale if r_cfg_scale is None else r_cfg_scale
    nfe = cfg.nfe if nfe is None else nfe
    method = cfg.ode_method if ode_method is None else ode_method

    b, t_frames, dim_w = wa.shape
    clip = cfg.num_frames_for_clip
    n_chunks = math.ceil(t_frames / clip)
    dynamic = we.shape[1] > 1
    dim_e = we.shape[2]

    wa_p = pad_to_chunks(wa, clip)
    wa_chunks = jnp.moveaxis(wa_p.reshape(b, n_chunks, clip, dim_w), 1, 0)
    if dynamic:
        we_p = pad_to_chunks(we, clip)
        we_chunks = jnp.moveaxis(we_p.reshape(b, n_chunks, clip, dim_e), 1, 0)
    else:
        we_chunks = None

    if noise is None:
        if key is None:
            raise ValueError("pass either key= or noise=")
        # per-chunk fold_in: chunk c's noise depends only on (key, c), so
        # the generated prefix is stable across clip lengths and shape
        # buckets (the reference's sequential per-chunk torch.randn has
        # the same property, FLOAT.py:215)
        # drawn in f32 then cast — same trajectory across sampler dtypes
        noise = jax.vmap(lambda c: jax.random.normal(
            jax.random.fold_in(key, c), (b, clip, dim_w),
            dtype=jnp.float32).astype(wa.dtype))(jnp.arange(n_chunks))
    else:
        noise = jnp.asarray(noise, dtype=wa.dtype)
        if noise.shape != (n_chunks, b, clip, dim_w):
            raise ValueError(f"noise shape {noise.shape} != {(n_chunks, b, clip, dim_w)}")

    def chunk_step(carry, inputs):
        if dynamic:
            x0, wa_t, we_t = inputs
        else:
            x0, wa_t = inputs
            we_t = we                      # static (B, 1, E), closed over
        sample_t, new_carry = sample_motion_chunk(
            fmt_params, r_s, wa_t, we_t, carry, x0, cfg=cfg,
            a_cfg_scale=a_s, e_cfg_scale=e_s, r_cfg_scale=r_s_scale,
            nfe=nfe, ode_method=method, cfg_mode=cfg_mode)
        return new_carry, sample_t

    init = sampler_init_carry(b, cfg, wa.dtype)
    xs = (noise, wa_chunks, we_chunks) if dynamic else (noise, wa_chunks)
    _, chunks = jax.lax.scan(chunk_step, init, xs)

    r_d = jnp.moveaxis(chunks, 0, 1).reshape(b, n_chunks * clip, dim_w)
    return r_d[:, :t_frames]
