"""Checkpoint loading: torch/HF state dicts and safetensors -> param pytrees.

Storage layouts supported (parity with SURVEY §5.4):
- unified ``FLOAT.safetensors`` with hierarchical keys
  (``motion_autoencoder.enc.*``, ``motion_autoencoder.dec.*``,
  ``audio_encoder.wav2vec2.*``, ``audio_encoder.audio_projection.*``,
  ``emotion_encoder.wav2vec2_for_emotion.*``, ``fmt.*``;
  reference: tools/save_combined_tool.py:98-115),
- split per-component safetensors (encoder/decoder/projection/fmt
  + 2 HF dirs; prefix map reference: utils/downloader.py:35-42),
- HF ``pytorch_model.bin`` / ``model.safetensors`` for the wav2vec2 towers.

Transforms applied at load time:
- key split on '.' -> nested dict pytree (torch tensor layouts preserved),
- positional-conv weight-norm folded to a plain conv weight (handles both
  the legacy ``weight_g``/``weight_v`` and the new
  ``parametrizations.weight.original0/1`` key forms),
- deterministic buffers dropped (blur ``kernel``, ``pos_embed``,
  ``alignment_mask``, ``masked_spec_embed`` — rebuilt from config; the
  reference loaders skip pos_embed/alignment_mask too,
  nodes_vadv_loader.py:825-840).
"""
from __future__ import annotations

import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

# buffers that are functions of config, never loaded
_DROP_LEAVES = {"kernel", "pos_embed", "alignment_mask", "masked_spec_embed",
                "num_batches_tracked"}
# NoiseInjection is identity at inference; its zero weight is unused
_DROP_SUFFIXES = (".noise.weight",)


def load_safetensors(path: str | os.PathLike) -> Dict[str, np.ndarray]:
    """Read a safetensors file into a flat {key: np.ndarray} dict."""
    from safetensors import safe_open
    out = {}
    with safe_open(str(path), framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_torch_pth(path: str | os.PathLike) -> Dict[str, np.ndarray]:
    """Read a legacy torch .pth/.bin state dict into a flat numpy dict.

    Covers the reference's legacy ``float.pth`` load path
    (generate.py:139-152) — per-parameter copy semantics; wav2vec2 weights
    come from HF dirs in that layout (io.hf.load_wav2vec2_dir).
    """
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def load_legacy_checkpoint(pth_path: str, wav2vec_dir: str, ser_dir: str,
                           dtype=jnp.float32) -> dict:
    """Legacy layout: float.pth (motion AE + projection + fmt) + 2 HF dirs.

    Mirrors InferenceAgent's legacy path (reference generate.py:139-152):
    non-wav2vec weights from the .pth, both towers from HF folders.
    """
    from .hf import load_wav2vec2_dir
    flat = load_torch_pth(pth_path)
    parts = split_unified(flat)
    w2v_params, _w2v_cfg, _ = load_wav2vec2_dir(wav2vec_dir)
    ser_params, _ser_cfg, _ = load_wav2vec2_dir(ser_dir)
    return {
        "encoder": flat_to_pytree(parts["encoder"], dtype),
        "synthesis": flat_to_pytree(parts["synthesis"], dtype),
        "audio_encoder": {
            "wav2vec2": w2v_params,
            "audio_projection": flat_to_pytree(parts["audio_projection"], dtype),
        },
        "emotion": ser_params,
        "fmt": flat_to_pytree(parts["fmt"], dtype),
    }


def _fold_weight_norm(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch weight_norm pairs into plain weights.

    Handles ``<p>.weight_g``/``<p>.weight_v`` and
    ``<p>.parametrizations.weight.original0``/``original1`` (g, v).
    torch weight_norm(dim=2) for conv1d: w = g * v / ||v|| with the norm
    over dims (0, 1), per kernel position.
    """
    out = dict(flat)
    for key in list(flat):
        if key.endswith(".weight_g"):
            prefix = key[: -len(".weight_g")]
            g = out.pop(key)
            v = out.pop(prefix + ".weight_v")
        elif key.endswith(".parametrizations.weight.original0"):
            prefix = key[: -len(".parametrizations.weight.original0")]
            g = out.pop(key)
            v = out.pop(prefix + ".parametrizations.weight.original1")
        else:
            continue
        norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1), keepdims=True))
        out[prefix + ".weight"] = (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
    return out


def flat_to_pytree(flat: Mapping[str, np.ndarray], dtype=jnp.float32) -> dict:
    """Flat torch-style keys -> nested dict pytree of jnp arrays."""
    flat = _fold_weight_norm(dict(flat))
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        if parts[-1] in _DROP_LEAVES:
            continue
        if any(key.endswith(s) for s in _DROP_SUFFIXES):
            continue
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value), dtype=dtype)
    return tree


def subtree(flat: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Select keys under ``prefix.`` and strip it."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in flat.items() if k.startswith(prefix + ".")}


# unified-checkpoint component prefixes (reference: utils/downloader.py:35-42)
UNIFIED_PREFIXES = {
    "encoder": "motion_autoencoder.enc",
    "synthesis": "motion_autoencoder.dec",
    "wav2vec2": "audio_encoder.wav2vec2",
    "audio_projection": "audio_encoder.audio_projection",
    "emotion": "emotion_encoder.wav2vec2_for_emotion",
    "fmt": "fmt",
}


def split_unified(flat: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Unified checkpoint -> per-component flat dicts."""
    return {name: subtree(flat, pfx) for name, pfx in UNIFIED_PREFIXES.items()}


def load_unified_checkpoint(path: str | os.PathLike, dtype=jnp.float32) -> dict:
    """FLOAT.safetensors -> {component: pytree} ready for the models.

    The emotion component keeps its inner structure:
    {'wav2vec2': ..., 'classifier': ...} (HF Wav2Vec2ForSpeechClassification
    nests the tower under ``wav2vec2.``).
    """
    flat = load_safetensors(path)
    parts = split_unified(flat)
    out = {
        "encoder": flat_to_pytree(parts["encoder"], dtype),
        "synthesis": flat_to_pytree(parts["synthesis"], dtype),
        "audio_encoder": {
            "wav2vec2": flat_to_pytree(parts["wav2vec2"], dtype),
            "audio_projection": flat_to_pytree(parts["audio_projection"], dtype),
        },
        "fmt": flat_to_pytree(parts["fmt"], dtype),
    }
    emo = flat_to_pytree(parts["emotion"], dtype)
    # flatten HF nesting: wav2vec2 tower + classifier side by side
    emo_params = emo.get("wav2vec2", {})
    emo_params = dict(emo_params)
    if "classifier" in emo:
        emo_params["classifier"] = emo["classifier"]
    out["emotion"] = emo_params
    return out


# ---------------------------------------------------------------------------
# shape-driven architecture inference (reference: nodes_vadv_loader.py, §2.8)
# ---------------------------------------------------------------------------

def infer_encoder_arch(flat: Mapping[str, np.ndarray]) -> dict:
    """dims from an encoder checkpoint (reference: nodes_vadv_loader.py:341-473)."""
    from ..config import CHANNELS_MAP
    dim_m = flat["fc.4.weight"].shape[0]
    dim_w = flat["fc.0.weight"].shape[0]
    first_out = flat["net_app.convs.0.0.weight"].shape[0]
    # first conv maps 3 -> CHANNELS_MAP[input_size]; smallest size wins ties
    sizes = sorted(s for s, c in CHANNELS_MAP.items() if c == first_out)
    if not sizes:
        raise ValueError(f"cannot infer input size from {first_out} channels")
    # count res blocks to disambiguate: log2(size) - 2 blocks
    n_res = len({k.split(".")[2] for k in flat
                 if k.startswith("net_app.convs.")}) - 2
    return {"input_size": 2 ** (n_res + 2), "dim": dim_w, "dim_motion": dim_m,
            "first_conv_channels": first_out, "inv_map_size": sizes[-1]}


def infer_synthesis_arch(flat: Mapping[str, np.ndarray]) -> dict:
    """(reference: nodes_vadv_loader.py:476-652)."""
    style_dim = flat["conv1.conv.modulation.weight"].shape[1]
    motion_dim = flat["direction.weight"].shape[1]
    n_rgb = len({k.split(".")[1] for k in flat if k.startswith("to_rgbs.")})
    return {"size": 2 ** (n_rgb + 2), "style_dim": style_dim,
            "motion_dim": motion_dim}


def infer_fmt_arch(flat: Mapping[str, np.ndarray]) -> dict:
    """(reference: nodes_vadv_loader.py:655-866)."""
    dim_h = flat["x_embedder.proj.weight"].shape[0]
    dim_w = flat["x_embedder.proj.weight"].shape[1]
    depth = 1 + max(int(k.split(".")[1]) for k in flat if k.startswith("blocks."))
    mlp_hidden = flat["blocks.0.mlp.fc1.weight"].shape[0]
    c_in = flat["c_embedder.weight"].shape[1]
    return {"dim_h": dim_h, "dim_w": dim_w, "fmt_depth": depth,
            "mlp_ratio": mlp_hidden / dim_h,
            "c_embedder_in": c_in}            # dim_a = c_in - dim_w - dim_e


def infer_projection_arch(flat: Mapping[str, np.ndarray]) -> dict:
    """(reference: nodes_vadv_loader.py:159-257)."""
    w = flat["0.weight"]
    return {"input_dim": w.shape[1], "output_dim": w.shape[0]}
