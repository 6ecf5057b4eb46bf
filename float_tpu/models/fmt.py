"""Flow Matching Transformer (FMT) — DiT-style adaLN-zero transformer.

Functional re-design of the reference FlowMatchingTransformer
(reference: src/nodes/models/float/FMT.py:201-401).

Param pytree mirrors the checkpoint's ``fmt.*`` keys:

    x_embedder.proj.{weight,bias}           Linear dim_w -> dim_h
    t_embedder.mlp.{0,2}.{weight,bias}      timestep MLP (256 -> h -> h)
    c_embedder.{weight,bias}                Linear (dim_w+dim_a+dim_e) -> h
    blocks.{i}.attn.qkv / attn.proj
    blocks.{i}.mlp.fc1 / mlp.fc2
    blocks.{i}.adaLN_modulation.1.{weight,bias}
    decoder.adaLN_modulation.1 / decoder.linear

``pos_embed`` and ``alignment_mask`` are NEVER loaded — they are
deterministic functions of the config, rebuilt here (the reference loaders
skip those keys too: nodes_vadv_loader.py:825-840).

TPU notes: 60-token/1024-dim blocks are small; the win is batching — the CFG
variants ride the batch dimension (3B or 4B) so every matmul feeds the MXU
with one large GEMM, and the whole ODE step is jit-fused into a single
device program.  Inference-only: condition dropout is omitted (train=False
path of the reference).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# deterministic tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sinusoid_table_np(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoidal position table (reference: FMT.py:22-40)."""
    pos = np.arange(n_position)[:, None]
    idx = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (idx // 2) / d_hid)
    table = angle.copy()
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def sinusoid_pos_embed(n_position: int, d_hid: int) -> jnp.ndarray:
    return jnp.asarray(_sinusoid_table_np(n_position, d_hid))


@functools.lru_cache(maxsize=None)
def _banded_mask_np(t: int, s: int, expansion: int) -> np.ndarray:
    """True = BLOCKED outside the ±expansion band (reference: FMT.py:15-19)."""
    mask = np.ones((t, s), dtype=bool)
    for i in range(t):
        mask[i, max(0, i - expansion): i + expansion + 1] = False
    return mask


def alignment_bias(t: int, s: int, expansion: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive attention bias: 0 in-band, -inf (large negative) outside."""
    blocked = _banded_mask_np(t, s, expansion)
    return jnp.asarray(np.where(blocked, -1e9, 0.0).astype(np.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _linear(p, x):
    w = p["weight"].astype(x.dtype)
    out = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    return (out + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _layer_norm(x, eps=1e-6):
    """Non-affine LayerNorm (elementwise_affine=False)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """GLIDE-style sinusoidal frequency embedding, cos-first
    (reference: FMT.py:107-126)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _t_embedder(p, t):
    h = _linear(p["mlp"]["0"], timestep_embedding(t, 256))
    h = jax.nn.silu(h)
    return _linear(p["mlp"]["2"], h)


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


def _attention(p, x, bias, num_heads: int):
    b, n, c = x.shape
    hd = c // num_heads
    qkv = _linear(p["qkv"], x)                                   # (B, N, 3C)
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]           # (B, N, H, hd)
    q = jnp.einsum("bnhd->bhnd", q)
    k = jnp.einsum("bnhd->bhnd", k)
    v = jnp.einsum("bnhd->bhnd", v)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    logits = logits + bias.astype(jnp.float32)
    att = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", att, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.einsum("bhnd->bnhd", out).reshape(b, n, c)
    return _linear(p["proj"], out)


def _mlp(p, x):
    h = _linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=True)     # tanh-approx GELU (timm Mlp)
    return _linear(p["fc2"], h)


def _fmt_block(p, x, c, bias, num_heads: int):
    mod = _linear(p["adaLN_modulation"]["1"], jax.nn.silu(c))
    (shift_msa, scale_msa, gate_msa,
     shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
    x = x + gate_msa * _attention(p["attn"], _modulate(_layer_norm(x), shift_msa, scale_msa),
                                  bias, num_heads)
    x = x + gate_mlp * _mlp(p["mlp"], _modulate(_layer_norm(x), shift_mlp, scale_mlp))
    return x


def _decoder_head(p, x, c):
    mod = _linear(p["adaLN_modulation"]["1"], jax.nn.silu(c))
    shift, scale = jnp.split(mod, 2, axis=-1)
    return _linear(p["linear"], _modulate(_layer_norm(x), shift, scale))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def fmt_forward(
    params,
    t: jnp.ndarray,          # (B,) or (1,) flow time
    x: jnp.ndarray,          # (B, L, dim_w) current noisy motion latents
    wa: jnp.ndarray,         # (B, L, dim_a) audio latents
    wr: jnp.ndarray,         # (B, dim_w) reference motion latent
    we: jnp.ndarray,         # (B, 1, E) static or (B, L, E) dynamic emotion
    prev_x: jnp.ndarray,     # (B, L', dim_w)
    prev_wa: jnp.ndarray,    # (B, L', dim_a)
    prev_we: jnp.ndarray | None,   # (B, L', E), required when we dynamic
    *,
    depth: int,
    num_heads: int,
    attention_window: int,
) -> jnp.ndarray:
    """Inference forward (train=False).  Returns (B, L'+L, dim_w) velocity.

    Mirrors FMT.forward (reference FMT.py:277-340) with prev-concat, static
    pos table, and the banded alignment mask.
    """
    dynamic = we.shape[1] > 1

    x = jnp.concatenate([prev_x, x], axis=1)
    wa = jnp.concatenate([prev_wa, wa], axis=1)
    total = x.shape[1]
    if dynamic:
        if prev_we is None:
            raise ValueError("dynamic we requires prev_we")
        we = jnp.concatenate([prev_we, we], axis=1)
    else:
        we = jnp.broadcast_to(we, (we.shape[0], total, we.shape[2]))

    t_emb = _t_embedder(params["t_embedder"], t)[:, None, :]          # (B|1, 1, H)

    h = _linear(params["x_embedder"]["proj"], x)
    h = h + sinusoid_pos_embed(total, h.shape[-1]).astype(h.dtype)[None]

    wr_b = jnp.broadcast_to(wr[:, None, :], (wr.shape[0], total, wr.shape[-1]))
    cond = jnp.concatenate([wr_b, wa, we.astype(wa.dtype)], axis=-1)
    c = _linear(params["c_embedder"], cond)
    c = t_emb.astype(c.dtype) + c

    bias = alignment_bias(total, total, attention_window)[None, None]  # (1,1,T,T)
    for i in range(depth):
        h = _fmt_block(params["blocks"][str(i)], h, c, bias, num_heads)
    return _decoder_head(params["decoder"], h, c)


def infer_cfg_mode(a_cfg_scale, r_cfg_scale, e_cfg_scale,
                   include_r_cfg: bool) -> str:
    """Structural CFG mode from *python float* scales: 'skip' when all are
    exactly 1.0 (reference FMT.py:346), else '3way'/'4way'."""
    if a_cfg_scale == 1.0 and r_cfg_scale == 1.0 and e_cfg_scale == 1.0:
        return "skip"
    return "4way" if include_r_cfg else "3way"


def fmt_forward_cfg(
    params,
    t, x, wa, wr, we, prev_x, prev_wa, prev_we,
    *,
    a_cfg_scale=1.0,
    r_cfg_scale=1.0,
    e_cfg_scale=1.0,
    include_r_cfg: bool = False,
    cfg_mode: str | None = None,
    depth: int,
    num_heads: int,
    attention_window: int,
) -> jnp.ndarray:
    """Classifier-free vector field (reference FMT.py:342-401).

    3-way batch [uncond(wr) | all_cond | audio_only] combined as
    uncond + a·(audio_only − uncond) + e·(all − audio_only);
    4-way variant prepends truly_uncond with r_cfg.
    Skips CFG entirely when every scale is exactly 1.0.

    ``cfg_mode`` ('skip'|'3way'|'4way') is the *structural* decision and
    must be static under jit; when None it is inferred from the scales
    (which then must be python floats).  The scale values themselves may be
    traced arrays — changing them does NOT recompile.
    """
    kw = dict(depth=depth, num_heads=num_heads, attention_window=attention_window)
    if cfg_mode is None:
        cfg_mode = infer_cfg_mode(a_cfg_scale, r_cfg_scale, e_cfg_scale,
                                  include_r_cfg)
    if cfg_mode == "skip":
        return fmt_forward(params, t, x, wa, wr, we, prev_x, prev_wa, prev_we, **kw)

    zero = jnp.zeros_like
    include_r_cfg = cfg_mode == "4way"
    n_way = 4 if include_r_cfg else 3

    if include_r_cfg:
        wa_c = jnp.concatenate([zero(wa), zero(wa), wa, wa], axis=0)
        wr_c = jnp.concatenate([zero(wr), wr, wr, wr], axis=0)
        we_c = jnp.concatenate([zero(we), zero(we), we, zero(we)], axis=0)
        pwe_c = None if prev_we is None else jnp.concatenate(
            [zero(prev_we), zero(prev_we), prev_we, zero(prev_we)], axis=0)
    else:
        wa_c = jnp.concatenate([zero(wa), wa, wa], axis=0)
        wr_c = jnp.concatenate([wr, wr, wr], axis=0)
        we_c = jnp.concatenate([zero(we), we, zero(we)], axis=0)
        pwe_c = None if prev_we is None else jnp.concatenate(
            [zero(prev_we), prev_we, zero(prev_we)], axis=0)

    x_c = jnp.concatenate([x] * n_way, axis=0)
    px_c = jnp.concatenate([prev_x] * n_way, axis=0)
    pwa_c = jnp.concatenate([prev_wa] * n_way, axis=0)

    out = fmt_forward(params, t, x_c, wa_c, wr_c, we_c, px_c, pwa_c, pwe_c, **kw)

    if include_r_cfg:
        truly_uncond, uncond, all_cond, audio_only = jnp.split(out, 4, axis=0)
        return (truly_uncond
                + r_cfg_scale * (uncond - truly_uncond)
                + a_cfg_scale * (audio_only - uncond)
                + e_cfg_scale * (all_cond - audio_only))
    uncond, all_cond, audio_only = jnp.split(out, 3, axis=0)
    return (uncond
            + a_cfg_scale * (audio_only - uncond)
            + e_cfg_scale * (all_cond - audio_only))
