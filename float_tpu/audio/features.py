"""Waveform feature normalization — Wav2Vec2FeatureExtractor equivalent.

The reference loads HF's Wav2Vec2FeatureExtractor from the bundled
preprocessor_config.json (do_normalize=true) and applies per-utterance
zero-mean/unit-variance normalization (reference: generate.py:42-81,
nodes_vadv.py:28-144).  Batch mode zero-pads to the longest item and
normalizes per item over its true length.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

_VAR_EPS = 1e-7


def normalize_waveform(wave: np.ndarray) -> np.ndarray:
    """(N,) -> zero-mean / unit-variance float32 (eps=1e-7, HF parity)."""
    w = np.asarray(wave, dtype=np.float32)
    mean = w.mean()
    var = w.var()
    return ((w - mean) / np.sqrt(var + _VAR_EPS)).astype(np.float32)


def extract_features(waves: Sequence[np.ndarray]) -> np.ndarray:
    """Batch of (N_i,) -> (B, N_max) zero-padded + normalized input_values.

    Matches Wav2Vec2FeatureExtractor(..., padding=True) with the reference's
    bundled config (return_attention_mask=false,
    model_configs/wav2vec2_base/preprocessor_config.json): items are padded
    FIRST and normalization runs over the padded signal, zeros included.
    """
    n_max = max(len(w) for w in waves)
    out = np.zeros((len(waves), n_max), np.float32)
    for i, w in enumerate(waves):
        out[i, :len(w)] = w
        out[i] = normalize_waveform(out[i])
    return out
