"""Audio channel-mixing and resampling (reference: src/nodes/resample.py).

Parity contract:
- input is the ComfyUI AUDIO dict {'waveform': (B, C, N), 'sample_rate'},
- the first batch item is used, channels are averaged to mono
  (librosa.to_mono == mean over channels), output float32,
- resampling to 16 kHz.  The reference uses librosa/soxr 'soxr_hq'; here a
  polyphase windowed-sinc (Kaiser) filter via scipy.signal.resample_poly —
  equivalent quality class, no librosa/soxr dependency.
"""
from __future__ import annotations

import math
from typing import Mapping

import numpy as np
from scipy.signal import resample_poly


def to_mono(wave: np.ndarray) -> np.ndarray:
    """(C, N) or (N,) -> (N,) float32 by channel mean."""
    w = np.asarray(wave)
    if w.ndim == 2:
        if w.shape[0] > 1:
            w = w.mean(axis=0)
        else:
            w = w[0]
    return np.ascontiguousarray(w, dtype=np.float32)


def resample(wave: np.ndarray, sr_in: int, sr_out: int = 16000) -> np.ndarray:
    """High-quality polyphase resample (N,) float32 -> (M,) float32."""
    if sr_in == sr_out:
        return np.ascontiguousarray(wave, dtype=np.float32)
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g
    out = resample_poly(wave.astype(np.float64), up, down,
                        window=("kaiser", 14.769656459379492))
    return np.ascontiguousarray(out, dtype=np.float32)


def comfy_audio_to_mono_16k(audio: Mapping, target_sr: int = 16000) -> np.ndarray:
    """ComfyUI AUDIO dict -> mono float32 at target_sr.

    Mirrors comfy_audio_to_librosa_mono + resample
    (reference: resample.py:95-151): first batch item, channel mean,
    float32, resample.
    """
    wave = np.asarray(audio["waveform"])
    sr = int(audio["sample_rate"])
    if wave.ndim == 3:
        wave = wave[0]                  # first batch item (B, C, N) -> (C, N)
    mono = to_mono(wave)
    return resample(mono, sr, target_sr)
