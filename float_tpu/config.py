"""Configuration for the FLOAT TPU-native pipeline.

Mirrors the live fields of the reference ``BaseOptions`` dataclass
(reference: src/nodes/options/base_options.py:10-60) plus the
``ADV_FLOAT_DICT`` override surface (src/nodes/nodes_adv.py:130-235).

Unlike the reference — which mutates a single shared ``opt`` object at node
execution time — this config is an immutable (frozen) dataclass.  Per-call
overrides produce a *new* config via :meth:`FloatConfig.replace`, which keeps
every jitted function keyed on hashable static configuration.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

# Emotion label set (reference: src/nodes/__init__.py:13, FLOAT.py:390)
EMOTION_LABELS = ("angry", "disgust", "fear", "happy", "neutral", "sad", "surprise")
# UI adds "none" = predict from audio
EMOTIONS_UI = ("none",) + EMOTION_LABELS

# Fixed-step ODE solver whitelist (reference: src/nodes/__init__.py:15-23)
ODE_SOLVERS = ("euler", "midpoint", "rk4", "heun2", "heun3")

# StyleGAN2 channel map (reference: src/nodes/models/misc.py:1-11)
CHANNELS_MAP = {
    4: 512, 8: 512, 16: 512, 32: 512, 64: 256,
    128: 128, 256: 64, 512: 32, 1024: 16,
}

# RGBA conversion strategies (reference: src/nodes/utils/image.py:38-131)
RGBA_STRATEGIES = ("blend_with_color", "discard_alpha", "replace_with_color")


@dataclass(frozen=True)
class FloatConfig:
    """Static model/inference configuration.

    Every field that shapes a compiled graph lives here; the whole object is
    hashable so it can be passed as a static argument to ``jax.jit``.
    """

    # --- geometry / modality dims (reference: base_options.py) ---
    input_size: int = 512
    input_nc: int = 3
    fps: float = 25.0
    sampling_rate: int = 16000
    wav2vec_sec: float = 2.0
    attention_window: int = 2
    only_last_features: bool = False

    dim_a: int = 512          # audio latent dim
    dim_w: int = 512          # appearance / motion latent dim
    dim_h: int = 1024         # FMT hidden
    dim_m: int = 20           # motion magnitude dim
    dim_e: int = 7            # emotion classes

    fmt_depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    num_prev_frames: int = 10

    # dropout probs (training-only semantics; kept for parity of the API)
    audio_dropout_prob: float = 0.1
    ref_dropout_prob: float = 0.1
    emotion_dropout_prob: float = 0.1

    # --- ODE sampling ---
    nfe: int = 10
    ode_atol: float = 1e-5
    ode_rtol: float = 1e-5
    ode_method: str = "euler"

    # --- CFG scales ---
    a_cfg_scale: float = 2.0
    e_cfg_scale: float = 1.0
    r_cfg_scale: float = 1.0
    include_r_cfg: bool = False

    # --- seeding ---
    seed: int = 15
    fix_noise_seed: bool = True

    # --- preprocessing ---
    face_margin: float = 1.6
    rgba_conversion: str = "blend_with_color"
    bkg_color_hex: str = "#000000"

    # --- TPU-specific execution knobs (no reference equivalent) ---
    compute_dtype: str = "bfloat16"      # compute precision for conv/matmul paths
    param_dtype: str = "float32"         # storage precision of weights
    # Frames decoded per Synthesis forward.  8 keeps tiny-config tests and
    # small clips cheap (chunks PAD up to decode_batch); for 512² serving
    # the measured-best value on v5e is 24 (463.6 vs 451.9 frames/s at 16,
    # 432 at 20, 345 at 32 — PERF.md round 3; bench.py defaults to it).
    decode_batch: int = 8
    # Pallas warp kernels in the decode (False = exact XLA-gather warps —
    # the only decode mode that runs on non-TPU backends; the readiness
    # gate's off-chip flow probe uses it)
    use_pallas: bool = True
    # FMT sampler compute precision.  float32 (default) matches the
    # reference's torch path; bfloat16 roughly doubles the CFG-ODE
    # stage's MFU (the sampler is the only stage that scales with clip
    # length and cannot frame-parallelize) at ~1e-2 relative latent
    # error — opt-in until trained-weight quality is validated.
    sampler_dtype: str = "float32"
    # SER memory bound: clips longer than this predict emotion over
    # fixed-length windows (scores averaged, weighted by window length) —
    # the full-clip wav2vec2-large attention is O(T²) and a 5-min clip
    # would need ~hundreds of GB of logits.  The reference runs the SER
    # unchunked (FLOAT.py:397) but its own dynamic-emotion node shows the
    # windowed pattern (nodes_vadv.py:738-844).
    ser_max_sec: float = 60.0

    # --- derived ---
    @property
    def num_frames_for_clip(self) -> int:
        # reference: FMT.py:209
        return int(self.wav2vec_sec * self.fps)

    @property
    def num_total_frames(self) -> int:
        # reference: FMT.py:211
        return self.num_prev_frames + self.num_frames_for_clip

    @property
    def n_latent(self) -> int:
        # reference: styledecoder.py:495 (2*log2(size) - 2)
        import math
        return int(math.log2(self.input_size)) * 2 - 2

    def replace(self, **kw) -> "FloatConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "FloatConfig":
        if self.ode_method not in ODE_SOLVERS:
            raise ValueError(
                f"ode_method {self.ode_method!r} not in {ODE_SOLVERS}")
        if self.rgba_conversion not in RGBA_STRATEGIES:
            raise ValueError(
                f"rgba_conversion {self.rgba_conversion!r} not in {RGBA_STRATEGIES}")
        if self.input_size not in CHANNELS_MAP:
            raise ValueError(f"input_size {self.input_size} unsupported")
        if self.dim_h % self.num_heads:
            raise ValueError("dim_h must be divisible by num_heads")
        return self


# The "advanced options" override dict keys, mirroring ADV_FLOAT_DICT
# (reference: nodes_adv.py:130-235).  Maps the reference's key names onto
# FloatConfig field names.
ADV_KEY_MAP = {
    "r_cfg_scale": "r_cfg_scale",
    "attention_window": "attention_window",
    "audio_dropout_prob": "audio_dropout_prob",
    "ref_dropout_prob": "ref_dropout_prob",
    "emotion_dropout_prob": "emotion_dropout_prob",
    "ode_atol": "ode_atol",
    "ode_rtol": "ode_rtol",
    "nfe": "nfe",
    "torchdiffeq_ode_method": "ode_method",
    "face_margin": "face_margin",
    "rgba_conversion": "rgba_conversion",
    "bkg_color_hex": "bkg_color_hex",
}


def apply_adv_options(cfg: FloatConfig, adv: dict | None) -> FloatConfig:
    """Apply an ADV_FLOAT_DICT-style override dict onto a config.

    Precedence mirrors the reference (nodes.py:113-122): explicit dict values
    override dataclass defaults; unknown keys raise.
    """
    if not adv:
        return cfg
    updates = {}
    for k, v in adv.items():
        if k not in ADV_KEY_MAP:
            raise KeyError(f"unknown advanced option {k!r}")
        updates[ADV_KEY_MAP[k]] = v
    return cfg.replace(**updates).validate()


@dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture config for wav2vec2 towers (base and large-SER).

    Field subset of HF's Wav2Vec2Config that the inference path needs
    (reference configs: src/nodes/model_configs/wav2vec2_base/config.json and
    emotion_ser/config.json).
    """
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"      # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False    # False = post-LN (base), True = pre-LN (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    num_labels: int = 0                   # >0 for the SER classifier head

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


WAV2VEC2_BASE = Wav2Vec2Config()

WAV2VEC2_LARGE_SER = Wav2Vec2Config(
    hidden_size=1024,
    num_hidden_layers=24,
    num_attention_heads=16,
    intermediate_size=4096,
    conv_bias=True,
    feat_extract_norm="layer",
    do_stable_layer_norm=True,
    num_labels=7,
)
