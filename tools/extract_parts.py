#!/usr/bin/env python
"""Extract component checkpoints from the unified FLOAT.safetensors.

Covers the reference's tools/extract_motion_ae_parts.py,
extract_wav2vec_parts.py, extract_fmt_weights.py, extract_projections.py
with one CLI:

    python tools/extract_parts.py FLOAT.safetensors --part fmt -o fmt.safetensors
    python tools/extract_parts.py FLOAT.safetensors --all -o models/float/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from float_tpu.io.download import EXTRACTION_PREFIXES, extract_part  # noqa: E402

DEFAULT_NAMES = {
    "encoder": "motion_autoencoder/encoder.safetensors",
    "decoder": "motion_autoencoder/decoder.safetensors",
    "projection": "audio_projections/projection.safetensors",
    "fmt": "fmt/fmt.safetensors",
    "wav2vec2_base": "audio/wav2vec2-base-960h/model.safetensors",
    "emotion_ser": "audio/wav2vec-english-speech-emotion-recognition/model.safetensors",
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("unified", help="path to FLOAT.safetensors")
    ap.add_argument("--part", choices=sorted(EXTRACTION_PREFIXES),
                    help="single part to extract")
    ap.add_argument("--all", action="store_true", help="extract every part")
    ap.add_argument("-o", "--output", required=True,
                    help="output file (--part) or directory (--all)")
    args = ap.parse_args()

    if args.all:
        ok = True
        for key, rel in DEFAULT_NAMES.items():
            dest = os.path.join(args.output, rel)
            ok &= extract_part(args.unified, key, dest)
        sys.exit(0 if ok else 1)
    if not args.part:
        ap.error("need --part or --all")
    sys.exit(0 if extract_part(args.unified, args.part, args.output) else 1)


if __name__ == "__main__":
    main()
