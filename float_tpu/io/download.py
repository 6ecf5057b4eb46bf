"""Model store management: download + unified->part extraction.

Parity with the reference's L5 layer (utils/downloader.py, SURVEY §2.11):
- same part URL table and extraction-prefix table,
- ``ensure_model_part_exists``: prefer extraction from the local unified
  checkpoint, fall back to direct download,
- gated gracefully when the environment has no network egress.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("float_tpu.download")

BASE_FLOAT = "https://huggingface.co/set-soft/float_advanced/resolve/main/"
FLOAT_URL = ("https://huggingface.co/set-soft/float/resolve/main/"
             "FLOAT.safetensors?download=true")
FLOAT_UNIFIED_MODEL = "FLOAT.safetensors"

MODEL_PART_URLS = {
    "encoder": BASE_FLOAT + "motion_autoencoder/encoder.safetensors",
    "decoder": BASE_FLOAT + "motion_autoencoder/decoder.safetensors",
    "projection": BASE_FLOAT + "audio_projections/projection.safetensors",
    "fmt": BASE_FLOAT + "fmt/fmt.safetensors?download=true",
    "wav2vec2_base": ("https://huggingface.co/facebook/wav2vec2-base-960h/"
                      "resolve/main/model.safetensors"),
    "emotion_ser": ("https://huggingface.co/r-f/"
                    "wav2vec-english-speech-emotion-recognition/resolve/main/"
                    "pytorch_model.bin"),
}

# prefixes within the unified checkpoint (reference: utils/downloader.py:34-42)
EXTRACTION_PREFIXES = {
    "encoder": "motion_autoencoder.enc",
    "decoder": "motion_autoencoder.dec",
    "projection": "audio_encoder.audio_projection",
    "fmt": "fmt",
    "wav2vec2_base": "audio_encoder.wav2vec2",
    "emotion_ser": "emotion_encoder.wav2vec2_for_emotion",
}


def download_file(url: str, dest: str, timeout: float = 60.0) -> bool:
    """Best-effort HTTP download; returns False when offline/unavailable."""
    import urllib.request
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    try:
        logger.info("downloading %s -> %s", url, dest)
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
        return True
    except Exception as exc:
        logger.warning("download failed (%s): %s", url, exc)
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def extract_part(unified_path: str, part_key: str, dest: str) -> bool:
    """Extract one component from the unified checkpoint into its own
    safetensors file (equivalent of the tools/extract_* scripts)."""
    from .checkpoint import load_safetensors, subtree
    from safetensors.numpy import save_file
    prefix = EXTRACTION_PREFIXES[part_key]
    flat = load_safetensors(unified_path)
    part = subtree(flat, prefix)
    if not part:
        logger.warning("no keys under %r in %s", prefix, unified_path)
        return False
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    save_file(part, dest)
    logger.info("extracted %d tensors (%s.*) -> %s", len(part), prefix, dest)
    return True


def ensure_model_part_exists(part_key: str, dest: str,
                             unified_model_path: Optional[str] = None) -> Optional[str]:
    """Part file path if present; else extract from unified; else download.

    Mirrors the reference flow (utils/downloader.py:44-125).
    """
    if os.path.exists(dest):
        return dest
    if unified_model_path and os.path.exists(unified_model_path):
        if extract_part(unified_model_path, part_key, dest):
            return dest
    url = MODEL_PART_URLS.get(part_key)
    if url and download_file(url, dest):
        return dest
    return None


def ensure_model_file(dest: str, url: str = FLOAT_URL) -> Optional[str]:
    """Ensure the unified checkpoint exists (download when possible)."""
    if os.path.exists(dest):
        return dest
    if download_file(url, dest):
        return dest
    return None
