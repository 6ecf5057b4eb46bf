"""float_tpu command-line interface.

    python -m float_tpu.cli generate --image face.png --audio speech.wav \
        --checkpoint models/float/FLOAT.safetensors --output out.mp4
    python -m float_tpu.cli inspect models/float/FLOAT.safetensors
    python -m float_tpu.cli workflow configs/default.json
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def _setup_logging(verbose: int):
    level = {0: logging.WARNING, 1: logging.INFO}.get(verbose, logging.DEBUG)
    logging.basicConfig(level=level,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")


def load_image_file(path: str):
    """Read an image file into (H, W, 3|4) float32 RGB(A) in [0, 1].

    .npy arrays load directly (auto-scaled from uint8 range); cv2 images
    keep their alpha channel so float_process can apply the RGBA
    strategies (blend/discard/replace, reference utils/image.py:38-131).
    """
    import numpy as np
    if path.endswith(".npy"):
        img = np.load(path).astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        return img
    import cv2
    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(f"cannot read image {path}")
    if raw.ndim == 2:
        raw = cv2.cvtColor(raw, cv2.COLOR_GRAY2RGB)
    elif raw.shape[-1] == 4:
        raw = cv2.cvtColor(raw, cv2.COLOR_BGRA2RGBA)
    else:
        raw = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
    return raw.astype(np.float32) / 255.0


def cmd_generate(args):
    import numpy as np
    import cv2
    from .api.nodes import load_float_models, float_process
    from .audio.resample import resample, to_mono

    pipe = load_float_models(args.checkpoint,
                             advanced_float_options=(
                                 json.loads(args.adv_options)
                                 if args.adv_options else None),
                             allow_synthetic=args.allow_synthetic)
    img = load_image_file(args.image)

    import wave as wavmod
    if args.audio.endswith(".npy"):
        audio_arr, sr = np.load(args.audio), 16000
    else:
        with wavmod.open(args.audio, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = np.frombuffer(w.readframes(n), dtype=np.int16)
            ch = w.getnchannels()
            audio_arr = raw.reshape(-1, ch).T.astype(np.float32) / 32768.0
    mono = resample(to_mono(audio_arr), sr, 16000)

    t0 = time.perf_counter()
    frames, _, fps = float_process(
        img[None], mono[None], pipe,
        a_cfg_scale=args.a_cfg_scale, e_cfg_scale=args.e_cfg_scale,
        fps=args.fps, emotion=args.emotion, face_align=args.face_align,
        seed=args.seed)
    dt = time.perf_counter() - t0
    print(f"generated {frames.shape[0]} frames in {dt:.2f}s "
          f"({frames.shape[0]/dt:.1f} fps)")

    if args.output.endswith(".npy"):
        import numpy as np
        np.save(args.output, frames)
    else:
        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                             args.fps, (w, h))
        for f in frames:
            vw.write(cv2.cvtColor((f * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2BGR))
        vw.release()
    print(f"wrote {args.output}")


def cmd_inspect(args):
    from .io.checkpoint import (load_safetensors, split_unified,
                                infer_encoder_arch, infer_synthesis_arch,
                                infer_fmt_arch, infer_projection_arch)
    flat = load_safetensors(args.checkpoint)
    total = sum(v.size for v in flat.values())
    print(f"{args.checkpoint}: {len(flat)} tensors, {total/1e6:.1f} M params")
    parts = split_unified(flat)
    for name, part in parts.items():
        if not part:
            continue
        n = sum(v.size for v in part.values())
        print(f"  {name}: {len(part)} tensors, {n/1e6:.1f} M params")
    try:
        if parts["encoder"]:
            print("  encoder arch:", infer_encoder_arch(parts["encoder"]))
        if parts["synthesis"]:
            print("  synthesis arch:", infer_synthesis_arch(parts["synthesis"]))
        if parts["fmt"]:
            print("  fmt arch:", infer_fmt_arch(parts["fmt"]))
        if parts["audio_projection"]:
            print("  projection arch:",
                  infer_projection_arch(parts["audio_projection"]))
    except Exception as exc:
        print("  (arch inference failed:", exc, ")")


def cmd_bench(args):
    import runpy
    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")


def cmd_workflow(args):
    """Run a JSON workflow config (the 5 BASELINE configs are expressible)."""
    from .runtime.workflow import run_workflow
    with open(args.config) as f:
        wf = json.load(f)
    run_workflow(wf, output=args.output)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="float_tpu", description=__doc__)
    ap.add_argument("-v", "--verbose", action="count", default=0)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="image + audio -> talking-head video")
    g.add_argument("--image", required=True)
    g.add_argument("--audio", required=True)
    g.add_argument("--output", default="out.mp4")
    g.add_argument("--checkpoint", default="models/float/FLOAT.safetensors")
    g.add_argument("--a-cfg-scale", type=float, default=2.0)
    g.add_argument("--e-cfg-scale", type=float, default=1.0)
    g.add_argument("--fps", type=float, default=25.0)
    g.add_argument("--emotion", default="none")
    g.add_argument("--face-align", nargs="?", const=True, default=False,
                   choices=[True, False, "fallback"],
                   type=lambda v: {"true": True, "false": False}.get(v, v),
                   help="detect+crop the face; 'fallback' allows a "
                        "center-crop when face_alignment is missing")
    g.add_argument("--seed", type=int, default=15)
    g.add_argument("--adv-options", help="JSON ADV_FLOAT_DICT overrides")
    g.add_argument("--allow-synthetic", action="store_true",
                   help="run with random weights when the checkpoint is "
                        "missing (testing only)")
    g.set_defaults(func=cmd_generate)

    i = sub.add_parser("inspect", help="show checkpoint structure + arch")
    i.add_argument("checkpoint")
    i.set_defaults(func=cmd_inspect)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(func=cmd_bench)

    w = sub.add_parser("workflow", help="run a JSON workflow config")
    w.add_argument("config")
    w.add_argument("--output", default="out")
    w.set_defaults(func=cmd_workflow)

    args = ap.parse_args(argv)
    _setup_logging(args.verbose)
    args.func(args)


if __name__ == "__main__":
    main()
