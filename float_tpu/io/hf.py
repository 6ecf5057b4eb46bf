"""Load HuggingFace-format wav2vec2 model directories into pytrees.

Equivalent of the reference's from_pretrained paths (LoadWav2VecModel /
LoadEmotionRecognitionModel, nodes_vadv_loader.py:60-156,260-338) without
instantiating torch modules: config.json -> Wav2Vec2Config, weight file ->
pytree via io.checkpoint (weight-norm folded, buffers dropped).
"""
from __future__ import annotations

import json
import os
from typing import Tuple

from ..config import Wav2Vec2Config
from .checkpoint import flat_to_pytree, load_safetensors, subtree


def config_from_json(path: str) -> Wav2Vec2Config:
    with open(path) as f:
        raw = json.load(f)
    return Wav2Vec2Config(
        hidden_size=raw["hidden_size"],
        num_hidden_layers=raw["num_hidden_layers"],
        num_attention_heads=raw["num_attention_heads"],
        intermediate_size=raw["intermediate_size"],
        conv_dim=tuple(raw["conv_dim"]),
        conv_kernel=tuple(raw["conv_kernel"]),
        conv_stride=tuple(raw["conv_stride"]),
        conv_bias=raw.get("conv_bias", False),
        feat_extract_norm=raw.get("feat_extract_norm", "group"),
        do_stable_layer_norm=raw.get("do_stable_layer_norm", False),
        num_conv_pos_embeddings=raw.get("num_conv_pos_embeddings", 128),
        num_conv_pos_embedding_groups=raw.get("num_conv_pos_embedding_groups", 16),
        layer_norm_eps=raw.get("layer_norm_eps", 1e-5),
        num_labels=len(raw.get("id2label", {})) if raw.get("id2label") else 0,
    )


def load_state_dict_file(model_dir: str) -> dict:
    """Read model.safetensors or pytorch_model.bin from an HF dir."""
    st = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st):
        return load_safetensors(st)
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found in {model_dir}")


def load_wav2vec2_dir(model_dir: str) -> Tuple[dict, Wav2Vec2Config, dict]:
    """HF dir -> (params pytree, config, id2label or {}).

    Handles both bare Wav2Vec2Model checkpoints and classifier checkpoints
    (keys under ``wav2vec2.`` + ``classifier.``).
    """
    cfg = config_from_json(os.path.join(model_dir, "config.json"))
    flat = load_state_dict_file(model_dir)
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    id2label = {int(k): v for k, v in raw.get("id2label", {}).items()} \
        if raw.get("id2label") else {}

    if any(k.startswith("wav2vec2.") for k in flat):
        tower = subtree(flat, "wav2vec2")
        params = flat_to_pytree(tower)
        cls = subtree(flat, "classifier")
        if cls:
            params["classifier"] = flat_to_pytree(cls)
    else:
        params = flat_to_pytree(flat)
    return params, cfg, id2label
