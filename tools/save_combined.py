#!/usr/bin/env python
"""Build the unified FLOAT.safetensors from split component checkpoints.

Equivalent of the reference's tools/save_combined_tool.py: prefixes each
part's keys with its unified-checkpoint namespace and writes one file.

    python tools/save_combined.py -o FLOAT.safetensors \
        --encoder encoder.safetensors --decoder decoder.safetensors \
        --projection projection.safetensors --fmt fmt.safetensors \
        --wav2vec2 wav2vec_dir_or_file --emotion ser_dir_or_file
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from float_tpu.io.checkpoint import load_safetensors  # noqa: E402
from float_tpu.io.download import EXTRACTION_PREFIXES  # noqa: E402

ARGS_TO_KEYS = {
    "encoder": "encoder", "decoder": "decoder", "projection": "projection",
    "fmt": "fmt", "wav2vec2": "wav2vec2_base", "emotion": "emotion_ser",
}


def load_any(path):
    if os.path.isdir(path):
        from float_tpu.io.hf import load_state_dict_file
        return load_state_dict_file(path)
    if path.endswith(".bin") or path.endswith(".pth"):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    return load_safetensors(path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", required=True)
    for name in ARGS_TO_KEYS:
        ap.add_argument(f"--{name}")
    args = ap.parse_args()

    combined = {}
    for arg_name, part_key in ARGS_TO_KEYS.items():
        path = getattr(args, arg_name)
        if not path:
            continue
        prefix = EXTRACTION_PREFIXES[part_key]
        flat = load_any(path)
        for k, v in flat.items():
            combined[f"{prefix}.{k}"] = v
        print(f"{arg_name}: {len(flat)} tensors under {prefix}.*")

    if not combined:
        ap.error("no parts given")
    from safetensors.numpy import save_file
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    save_file(combined, args.output)
    print(f"wrote {len(combined)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
