"""float_tpu — TPU-native (JAX/XLA/Pallas) audio-driven talking-portrait
framework with the capabilities of ComfyUI-FLOAT_Optimized.

Layering (bottom-up):
- ``ops``      kernel primitives (upfirdn2d, modulated conv, warp, ODE, ...)
- ``models``   pure-functional networks (motion AE, wav2vec2, FMT)
- ``runtime``  jit-compiled pipeline stages (encode / sample / decode)
- ``parallel`` mesh + sharding for multi-chip execution
- ``io``       checkpoint load/extract (safetensors pytrees)
- ``audio``/``image``  host-side pre/post-processing
- ``api``      node-surface adapter mirroring the reference's 18 operations
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    FloatConfig, Wav2Vec2Config, WAV2VEC2_BASE, WAV2VEC2_LARGE_SER,
    EMOTION_LABELS, EMOTIONS_UI, ODE_SOLVERS, CHANNELS_MAP,
    apply_adv_options,
)
