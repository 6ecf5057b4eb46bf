"""AudioEncoder — wav2vec2-base features -> projected audio latents wa.

Re-design of the reference AudioEncoder (reference:
src/nodes/models/float/FLOAT.py:304-375):

- right-pad the waveform with edge replication to seq_len*sr/fps samples,
- run wav2vec2 with frame-grid resampling,
- default (only_last_features=False): stack the 12 transformer layer outputs
  (hidden_states[1:]) to (B, T, 12*768=9216), layer-major per frame,
- audio_projection = Linear(9216->512) + LayerNorm + SiLU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import FloatConfig, Wav2Vec2Config
from .wav2vec2 import wav2vec2_frame_features, _linear, _layer_norm


def pad_wave_to_frames(wave: jnp.ndarray, seq_len: int, cfg: FloatConfig) -> jnp.ndarray:
    """Edge-replicate pad (B, N) to int(seq_len * sr / fps) samples
    (reference: FLOAT.py:370-373)."""
    target = int(seq_len * cfg.sampling_rate / cfg.fps)
    n = wave.shape[1]
    if n == target:
        return wave
    if n > target:
        raise ValueError(f"wave length {n} exceeds target {target}")
    return jnp.pad(wave, ((0, 0), (0, target - n)), mode="edge")


def stacked_features(params, wave: jnp.ndarray, seq_len: int,
                     w2v_cfg: Wav2Vec2Config,
                     only_last_features: bool = False) -> jnp.ndarray:
    """wav2vec2 features for projection: (B, T, 12*H) stacked or (B, T, H).

    Stacking layout matches torch.stack(hidden_states[1:], 1).permute(0,2,1,3)
    .reshape(B, T, -1): per frame, [layer1 | layer2 | ... | layer12] blocks
    (reference: FLOAT.py:345-352).
    """
    out = wav2vec2_frame_features(params, wave, seq_len, w2v_cfg,
                                  collect_hidden=not only_last_features)
    if only_last_features:
        return out.last_hidden_state
    layers = out.hidden_states[1:]                  # 12 layer outputs
    return jnp.concatenate(layers, axis=-1)         # (B, T, 12*H)


def audio_projection(params, feats: jnp.ndarray) -> jnp.ndarray:
    """Linear -> LayerNorm -> SiLU (reference: FLOAT.py:338-342).

    params keys: {'0': Linear, '1': LayerNorm} (torch Sequential indices).
    """
    h = _linear(params["0"], feats)
    h = _layer_norm(params["1"], h)
    return jax.nn.silu(h)


def encode_audio_with_prev(params, wave: jnp.ndarray, prev_wave: jnp.ndarray,
                           cfg: FloatConfig, w2v_cfg: Wav2Vec2Config) -> jnp.ndarray:
    """Training-style forward with previous-frame audio concatenated
    (reference AudioEncoder.forward with prev_a, FLOAT.py:354-368):
    seq_len = num_prev_frames + num_frames_for_clip over the joined wave."""
    joined = jnp.concatenate([prev_wave, wave], axis=1)
    seq_len = cfg.num_prev_frames + cfg.num_frames_for_clip
    joined = pad_wave_to_frames(joined, seq_len, cfg)
    feats = stacked_features(params["wav2vec2"], joined, seq_len, w2v_cfg,
                             cfg.only_last_features)
    return audio_projection(params["audio_projection"], feats)


def encode_audio(params, wave: jnp.ndarray, seq_len: int,
                 cfg: FloatConfig, w2v_cfg: Wav2Vec2Config) -> jnp.ndarray:
    """Full AudioEncoder.inference: wave (B, N) -> wa (B, seq_len, dim_w)
    (reference: FLOAT.py:370-375).

    params: {'wav2vec2': ..., 'audio_projection': ...}
    """
    wave = pad_wave_to_frames(wave, seq_len, cfg)
    feats = stacked_features(params["wav2vec2"], wave, seq_len, w2v_cfg,
                             cfg.only_last_features)
    return audio_projection(params["audio_projection"], feats)
