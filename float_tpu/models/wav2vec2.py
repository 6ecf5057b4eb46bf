"""wav2vec2 towers — audio content encoder (base) and SER emotion encoder
(large), pure-functional JAX.

Re-designs the reference's HF-subclassed models
(reference: src/nodes/models/wav2vec2.py, wav2vec2_ser.py) against the HF
Wav2Vec2 architecture spec.  Two config axes matter here (SURVEY §2.2/2.3):

- base (wav2vec2-base-960h): group-norm first conv layer, post-LayerNorm
  encoder blocks, hidden 768, 12 layers;
- large SER (wav2vec2-large-xlsr-53): per-layer LayerNorm conv stack,
  pre-LayerNorm ("stable") encoder blocks with a final LayerNorm, hidden
  1024, 24 layers, mean-pool + classification head.

Param pytrees follow the HF state_dict key layout (see models.init);
the positional conv's weight-norm is folded at load time.

TPU notes: the 7-conv feature extractor is a chain of thin 1-D convs that
XLA lowers to im2col matmuls; everything downstream is big (T×768/1024)
GEMMs.  The custom ``seq_len`` linear interpolation (the reference's key
trick, wav2vec2.py:184-197) happens right after the conv stack so the
transformer runs on the *frame grid* (25 fps), not the 49.95 Hz conv grid.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Wav2Vec2Config
from ..ops import linear_interpolate_time


def _linear(p, x):
    w = p["weight"].astype(x.dtype)
    out = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    return (out + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _conv1d(x, w, b=None, stride=1, padding=0, groups=1):
    """x: (B, C, T), w: (O, I/groups, K) torch layout."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=((padding, padding),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.reshape(1, -1, 1).astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# feature extractor (raw wave -> 49.95 Hz conv features)
# ---------------------------------------------------------------------------

def feature_extractor(params, wave: jnp.ndarray, cfg: Wav2Vec2Config) -> jnp.ndarray:
    """wave (B, N) -> conv features (B, T_conv, conv_dim[-1])."""
    x = wave[:, None, :]                                   # (B, 1, N)
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        p = params["conv_layers"][str(i)]
        x = _conv1d(x, p["conv"]["weight"], p["conv"].get("bias"), stride=s)
        if cfg.feat_extract_norm == "group" and i == 0:
            # GroupNorm(groups=C): per-channel normalization over time
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=2, keepdims=True)
            var = jnp.var(xf, axis=2, keepdims=True)
            xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
            x = (xf * p["layer_norm"]["weight"].reshape(1, -1, 1)
                 + p["layer_norm"]["bias"].reshape(1, -1, 1)).astype(x.dtype)
        elif cfg.feat_extract_norm == "layer":
            x = jnp.swapaxes(x, 1, 2)
            x = _layer_norm(p["layer_norm"], x)
            x = jnp.swapaxes(x, 1, 2)
        x = jax.nn.gelu(x, approximate=False)
    return jnp.swapaxes(x, 1, 2)                           # (B, T_conv, D)


# ---------------------------------------------------------------------------
# transformer encoder
# ---------------------------------------------------------------------------

def _pos_conv_embed(params, x, cfg: Wav2Vec2Config):
    """Grouped positional conv (kernel 128, groups 16, 'same'-ish padding:
    pad 64 then drop the trailing sample for even kernels), GELU."""
    h = jnp.swapaxes(x, 1, 2)                              # (B, C, T)
    p = params["conv"]
    h = _conv1d(h, p["weight"], p.get("bias"),
                padding=cfg.num_conv_pos_embeddings // 2,
                groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        h = h[:, :, :-1]
    h = jax.nn.gelu(h, approximate=False)
    return jnp.swapaxes(h, 1, 2)


def _attention(p, x, num_heads: int, bias=None):
    b, t, c = x.shape
    hd = c // num_heads
    q = _linear(p["q_proj"], x) * (hd ** -0.5)
    k = _linear(p["k_proj"], x)
    v = _linear(p["v_proj"], x)
    q = q.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    att = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", att, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return _linear(p["out_proj"], out)


def _feed_forward(p, x):
    h = jax.nn.gelu(_linear(p["intermediate_dense"], x), approximate=False)
    return _linear(p["output_dense"], h)


def _encoder_layer_post_ln(p, x, num_heads, bias=None):
    x = x + _attention(p["attention"], x, num_heads, bias)
    x = _layer_norm(p["layer_norm"], x)
    x = x + _feed_forward(p["feed_forward"], x)
    return _layer_norm(p["final_layer_norm"], x)


def _encoder_layer_pre_ln(p, x, num_heads, bias=None):
    x = x + _attention(p["attention"], _layer_norm(p["layer_norm"], x),
                       num_heads, bias)
    return x + _feed_forward(p["feed_forward"], _layer_norm(p["final_layer_norm"], x))


class EncoderOutput(NamedTuple):
    last_hidden_state: jnp.ndarray
    hidden_states: tuple        # (num_layers + 1) entries, HF layout


def encoder(params, x, cfg: Wav2Vec2Config, collect_hidden: bool = False,
            attention_mask=None) -> EncoderOutput:
    """Transformer encoder over projected features (B, T, H).

    ``attention_mask`` (B, T) 1=real frame: HF Wav2Vec2Encoder semantics —
    masked positions are zeroed BEFORE the positional conv and excluded
    from attention via an additive key bias (the reference passes the
    extractor mask into Wav2Vec2Model, wav2vec2_ser.py:77-86)."""
    bias = None
    if attention_mask is not None:
        m = attention_mask.astype(x.dtype)
        x = x * m[..., None]
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    x = x + _pos_conv_embed(params["pos_conv_embed"], x, cfg)
    hidden = []
    if cfg.do_stable_layer_norm:
        for i in range(cfg.num_hidden_layers):
            if collect_hidden:
                hidden.append(x)
            x = _encoder_layer_pre_ln(params["layers"][str(i)], x,
                                      cfg.num_attention_heads, bias)
        x = _layer_norm(params["layer_norm"], x)
    else:
        x = _layer_norm(params["layer_norm"], x)
        for i in range(cfg.num_hidden_layers):
            if collect_hidden:
                hidden.append(x)
            x = _encoder_layer_post_ln(params["layers"][str(i)], x,
                                       cfg.num_attention_heads, bias)
    if collect_hidden:
        hidden.append(x)
    return EncoderOutput(x, tuple(hidden))


def feat_extract_output_length(n: int, cfg: Wav2Vec2Config) -> int:
    """Conv-stack output length for ``n`` input samples (HF
    _get_feat_extract_output_lengths: L -> (L - k)//s + 1 per layer)."""
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return n


def feature_vector_attention_mask(attention_mask: jnp.ndarray,
                                  t_conv: int, cfg: Wav2Vec2Config):
    """Downsample a (B, N) sample-level mask to the (B, T_conv) frame grid
    (HF _get_feature_vector_attention_mask: frames up to the conv output
    length of each item\'s sample count are real)."""
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
    strides_k = list(zip(cfg.conv_kernel, cfg.conv_stride))
    for k, s in strides_k:
        lengths = (lengths - k) // s + 1
    frame = jnp.arange(t_conv)[None, :]
    return (frame < lengths[:, None]).astype(jnp.int32)


# ---------------------------------------------------------------------------
# full models
# ---------------------------------------------------------------------------

def wav2vec2_frame_features(params, wave: jnp.ndarray, seq_len: int,
                            cfg: Wav2Vec2Config,
                            collect_hidden: bool = True) -> EncoderOutput:
    """The reference Wav2VecModel.forward: conv features linearly resampled
    to ``seq_len`` video frames, then projected + encoded
    (reference: wav2vec2.py:33-98) — composition of the two split stages
    below (feature_extract + encode, wav2vec2.py:100-181)."""
    feats = feature_extract(params, wave, seq_len, cfg)
    return encode(params, feats, cfg, collect_hidden=collect_hidden)


def feature_extract(params, wave: jnp.ndarray, seq_len: int,
                    cfg: Wav2Vec2Config) -> jnp.ndarray:
    """Split stage 1 of the reference Wav2VecModel: conv features
    interpolated to the frame grid (reference: wav2vec2.py:100-119).
    Returns (B, seq_len, conv_dim[-1])."""
    feats = feature_extractor(params["feature_extractor"], wave, cfg)
    return linear_interpolate_time(feats, seq_len)


def encode(params, extract_features_out: jnp.ndarray, cfg: Wav2Vec2Config,
           collect_hidden: bool = True) -> EncoderOutput:
    """Split stage 2: feature projection + transformer encoder over
    already-extracted features (reference: wav2vec2.py:121-181)."""
    h = _layer_norm(params["feature_projection"]["layer_norm"],
                    extract_features_out)
    h = _linear(params["feature_projection"]["projection"], h)
    return encoder(params["encoder"], h, cfg, collect_hidden=collect_hidden)


def wav2vec2_standard(params, wave: jnp.ndarray, cfg: Wav2Vec2Config,
                      attention_mask=None) -> jnp.ndarray:
    """Standard HF Wav2Vec2Model forward (no frame resampling) -> last
    hidden state (B, T_conv, H).  Used by the SER tower.

    ``attention_mask`` (B, N) sample-level, 1=real: downsampled to the
    conv frame grid and applied with HF Wav2Vec2Model semantics (the
    xlsr-style SER configs set return_attention_mask=true)."""
    feats = feature_extractor(params["feature_extractor"], wave, cfg)
    frame_mask = None
    if attention_mask is not None:
        frame_mask = feature_vector_attention_mask(
            attention_mask, feats.shape[1], cfg)
    h = _layer_norm(params["feature_projection"]["layer_norm"], feats)
    h = _linear(params["feature_projection"]["projection"], h)
    return encoder(params["encoder"], h, cfg, collect_hidden=False,
                   attention_mask=frame_mask).last_hidden_state


def ser_logits(params, wave: jnp.ndarray, cfg: Wav2Vec2Config,
               attention_mask=None) -> jnp.ndarray:
    """Speech-emotion classifier: mean-pool over time + dense/tanh/out_proj
    (reference: wav2vec2_ser.py:23-124, pooling_mode='mean').

    Note the pool is UNMASKED even when a mask is given — exactly the
    reference\'s merged_strategy (torch.mean over dim=1,
    wav2vec2_ser.py:57-72); the mask only shapes the encoder pass."""
    h = wav2vec2_standard(params, wave, cfg, attention_mask=attention_mask)
    pooled = jnp.mean(h, axis=1)
    x = _linear(params["classifier"]["dense"], pooled)
    x = jnp.tanh(x)
    return _linear(params["classifier"]["out_proj"], x)


def predict_emotion(params, wave: jnp.ndarray, cfg: Wav2Vec2Config,
                    attention_mask=None) -> jnp.ndarray:
    """Softmax emotion scores (B, num_labels)
    (reference: FLOAT.py:396-401)."""
    return jax.nn.softmax(
        ser_logits(params, wave, cfg,
                   attention_mask=attention_mask).astype(jnp.float32), axis=-1)
