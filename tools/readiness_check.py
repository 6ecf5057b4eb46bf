#!/usr/bin/env python
"""Real-checkpoint readiness gate (VERDICT r2 #4).

ONE command that, given weights (or the synthesized stand-in), proves the
repo is ready to serve them:

  1. load      — checkpoint loads through every storage layout the loader
                 supports; param counts per part are printed,
  2. parity    — per-stage numeric parity vs recorded reference
                 activations (tools/parity_check.py) when an activations
                 file is given (record one with
                 tools/record_reference_activations.py),
  3. flow probe — generates probe clips and records the per-level warp
                 displacement bounds the clip regime actually needs
                 (the adaptive-D ratchet learns them; runtime/decode.py),
  4. profile   — persists the tuned per-level D into a warp profile the
                 serving ratchet seeds from (decode.load_warp_profile),
                 so the first production clip already runs the converged
                 optimistic programs with no flagged-chunk re-decodes.

Usage:
  python tools/readiness_check.py --checkpoint FLOAT.safetensors \
      [--activations acts.npz] [--profile-out warp_profile.json] \
      [--image face.npy] [--seconds 4] [--seeds 3] [--dtype bfloat16]

Exit code 0 = ready; non-zero names the failing gate.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gate_load(path: str):
    from float_tpu.io.checkpoint import (load_safetensors, split_unified,
                                         load_unified_checkpoint)
    flat = load_safetensors(path)
    parts = split_unified(flat)
    total = sum(v.size for v in flat.values())
    print(f"[load] {path}: {len(flat)} tensors, {total/1e6:.1f} M params")
    for name, part in parts.items():
        if part:
            print(f"[load]   {name}: {sum(v.size for v in part.values())/1e6:.1f} M")
    params = load_unified_checkpoint(path)
    missing = [k for k in ("encoder", "synthesis", "audio_encoder",
                           "emotion", "fmt") if k not in params]
    if missing:
        raise SystemExit(f"[load] FAIL: missing parts {missing}")
    print("[load] ok")
    return params


def gate_parity(activations: str, checkpoint: str, platform: str | None):
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__), "parity_check.py"),
           activations, "--checkpoint", checkpoint]
    if platform:
        cmd += ["--platform", platform]
    print("[parity]", " ".join(cmd))
    res = subprocess.run(cmd)
    if res.returncode != 0:
        raise SystemExit("[parity] FAIL (see above)")
    print("[parity] ok")


def gate_flow_probe(params, args):
    """Run probe clips through the full pipeline; the decode ratchet
    accumulates each level's needed displacement.  Returns the learned
    per-level D plus the raw per-seed stats."""
    import jax.numpy as jnp
    from float_tpu.config import FloatConfig
    from float_tpu.runtime.pipeline import FloatPipeline, audio_num_frames
    from float_tpu.runtime import decode as D

    # pallas_call cannot lower on XLA:CPU — the off-chip probe runs the
    # exact-gather decode instead.  The D ratchet learns identically
    # (flow_needed_disp is kernel-independent); only the kernel fast-path
    # spread stats are skipped, so the profile carries D floors and the
    # path ratchet re-learns per process on the chip.
    import jax
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        print("[probe] non-TPU backend: exact-gather decode "
              "(use_pallas=False); profile will carry D floors only")
    cfg = FloatConfig(compute_dtype=args.dtype, decode_batch=args.decode_batch,
                      use_pallas=on_tpu)
    pipe = FloatPipeline(params, cfg)

    rng = np.random.default_rng(0)
    if args.image:
        img = np.load(args.image).astype(np.float32)
        if img.ndim == 3:
            img = img.transpose(2, 0, 1)[None]
        if img.max() > 1.5:
            img = img / 127.5 - 1.0
    else:
        img = rng.standard_normal((1, 3, cfg.input_size,
                                   cfg.input_size)).astype(np.float32) * 0.3
    n = int(args.seconds * cfg.sampling_rate)
    t0 = time.perf_counter()
    for s in range(args.seeds):
        wave = rng.standard_normal((1, n)).astype(np.float32) * 0.1
        frames = pipe.generate(jnp.asarray(img), jnp.asarray(wave),
                               emotion="none", seed=15 + s)
        float(jnp.sum(frames[0, 0, 0]))     # sync (axon-safe)
        print(f"[probe] seed {15+s}: {frames.shape[0]} frames, "
              f"ratchet now {D._ratchet_get(cfg.input_size)}")
    dt = time.perf_counter() - t0
    total = args.seeds * audio_num_frames(n, cfg)
    print(f"[probe] {total} frames in {dt:.1f}s ({total/dt:.1f} fps)")
    disp = D._ratchet_get(cfg.input_size)
    print(f"[probe] learned per-level warp D at {cfg.input_size}²: {disp}")
    return cfg.input_size, disp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--activations", default=None,
                    help=".npz from record_reference_activations.py; "
                         "enables the per-stage parity gate")
    ap.add_argument("--profile-out", default=None,
                    help="where to write the warp profile (default: "
                         "warp_profile.json next to the checkpoint)")
    ap.add_argument("--image", default=None, help=".npy probe portrait")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--decode-batch", type=int, default=16)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform for the WHOLE run (cpu) — "
                         "env JAX_PLATFORMS is pinned on axon transports, "
                         "only jax.config.update works")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    params = gate_load(args.checkpoint)
    if args.activations:
        gate_parity(args.activations, args.checkpoint, args.platform)
    else:
        print("[parity] skipped (no --activations)")

    if not args.skip_probe:
        from float_tpu.runtime import decode as D
        size, disp = gate_flow_probe(params, args)
        out = args.profile_out or os.path.join(
            os.path.dirname(os.path.abspath(args.checkpoint)),
            "warp_profile.json")
        prof = D.save_warp_profile(out, checkpoint=args.checkpoint)
        print(f"[profile] wrote {out}: {json.dumps(prof['disp'])}")

    print("READY")


if __name__ == "__main__":
    main()
