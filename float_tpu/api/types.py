"""Node-surface datatypes — the contracts the reference's custom ComfyUI
types carry (SURVEY Appendix A), as plain dataclasses.

Conventions (ComfyUI parity):
- IMAGE: np/jnp (B, H, W, C) float32 [0, 1] RGB,
- AUDIO: {'waveform': (B, C, N), 'sample_rate': int},
- latents are jnp arrays with the shapes noted per field.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

from ..config import FloatConfig, Wav2Vec2Config


@dataclass
class FloatPipe:
    """FLOAT_PIPE: the full pipeline handle (InferenceAgent equivalent)."""
    pipeline: Any                       # runtime.pipeline.FloatPipeline
    cfg: FloatConfig
    weights: str = "unknown"            # "real" | "synthetic"


@dataclass
class AppearancePipe:
    """FLOAT_APPEARANCE_PIPE: {h_source (B, dim_w), feats [7 maps]}."""
    h_source: Any
    feats: List[Any]


@dataclass
class Wav2VecPipe:
    """WAV2VEC_PIPE: (model params, config) + device/sr metadata."""
    params: dict
    config: Wav2Vec2Config
    expected_sr: int = 16000


@dataclass
class EmotionModelPipe:
    """EMOTION_MODEL_PIPE: (SER params, config, label maps)."""
    params: dict
    config: Wav2Vec2Config
    id2label: Dict[int, str] = field(default_factory=dict)

    @property
    def label2id(self) -> Dict[str, int]:
        return {v: k for k, v in self.id2label.items()}

    @property
    def dim_e(self) -> int:
        return self.config.num_labels or len(self.id2label)


@dataclass
class AudioProjectionLayer:
    """AUDIO_PROJECTION_LAYER: Sequential(Linear, LayerNorm, SiLU) params."""
    params: dict
    input_dim: int
    output_dim: int


@dataclass
class EncoderModel:
    """FLOAT_ENCODER_MODEL: encoder params + inferred architecture."""
    params: dict
    input_size: int
    dim: int
    dim_motion: int


@dataclass
class SynthesisModel:
    """FLOAT_SYNTHESIS_MODEL: synthesis params + inferred architecture."""
    params: dict
    size: int
    style_dim: int
    motion_dim: int


@dataclass
class FMTModel:
    """FLOAT_FMT_MODEL: FMT params + construction options snapshot."""
    params: dict
    cfg: FloatConfig                    # carries dim/depth/window/fps fields
    construction_options: Dict[str, Any] = field(default_factory=dict)


BBox = Tuple[int, int, int, int]        # (x, y, w, h) square face box
