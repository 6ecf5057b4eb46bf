#!/usr/bin/env python
"""Numeric-parity harness: compare per-stage outputs against recorded
reference activations (SURVEY §4 test-strategy item d).

Usage:
  1. Record activations from the reference implementation (on any machine
     with the torch deps + checkpoint) into an .npz with keys:
       image            (1, 3, S, S) float32 [-1, 1] model input
       audio            (1, N) float32 normalized input_values
       s_r              (1, 512)    appearance latent
       r_s_lambda       (1, 20)     motion magnitudes
       r_s              (1, 512)    identity reference latent
       wa               (1, T, 512) audio latents
       we               (1, 1|T, 7) emotion latent
       noise            (n_chunks, 1, clip, 512) the x0 draws per chunk
       r_d              (1, T, 512) sampled motion latents
       frames           (T, S, S, 3) decoded frames in [0, 1]
     (any subset is fine; only present keys are checked)
  2. Run:  python tools/parity_check.py acts.npz --checkpoint FLOAT.safetensors

Reports max-abs / rel error per stage and pass/fail vs tolerances.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOLERANCES = {           # fp32 stage tolerances (atol, rtol)
    "s_r": (1e-3, 1e-3),
    "r_s_lambda": (1e-3, 1e-3),
    "r_s": (2e-3, 2e-3),
    "wa": (2e-3, 2e-3),
    "we": (1e-3, 1e-3),
    "r_d": (5e-3, 5e-3),
    "frames": (2e-2, 2e-2),
}


def compare(name, got, ref, atol, rtol):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    if got.shape != ref.shape:
        print(f"FAIL {name}: shape {got.shape} != {ref.shape}")
        return False
    err = np.abs(got - ref)
    rel = err / (np.abs(ref) + 1e-6)
    ok = bool((err <= atol + rtol * np.abs(ref)).all())
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|err|={err.max():.3e} "
          f"max rel={rel.max():.3e} (atol={atol}, rtol={rtol})")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("activations", help=".npz with recorded reference tensors")
    ap.add_argument("--checkpoint", default="models/float/FLOAT.safetensors")
    ap.add_argument("--emotion", default="none")
    args = ap.parse_args()

    import jax.numpy as jnp
    from float_tpu.config import FloatConfig
    from float_tpu.io.checkpoint import load_unified_checkpoint
    from float_tpu.runtime.pipeline import FloatPipeline, audio_num_frames

    acts = dict(np.load(args.activations))
    cfg = FloatConfig(compute_dtype="float32")      # full precision for parity
    params = load_unified_checkpoint(args.checkpoint)
    pipe = FloatPipeline(params, cfg)

    results = []
    img = jnp.asarray(acts["image"])
    wave = jnp.asarray(acts["audio"])
    t_frames = audio_num_frames(wave.shape[-1], cfg)

    s_r, lam, feats, r_s = pipe.encode_image(img)
    for name, got in [("s_r", s_r), ("r_s_lambda", lam), ("r_s", r_s)]:
        if name in acts:
            results.append(compare(name, got, acts[name], *TOLERANCES[name]))

    wa = pipe.encode_audio(wave, t_frames)
    if "wa" in acts:
        results.append(compare("wa", wa, acts["wa"], *TOLERANCES["wa"]))

    we = pipe.emotion_latent(wave, args.emotion)
    if "we" in acts:
        results.append(compare("we", we, acts["we"], *TOLERANCES["we"]))

    if "r_d" in acts:
        if "noise" not in acts:
            print("SKIP r_d: needs recorded 'noise' for bit-comparable sampling")
        else:
            from float_tpu.runtime.sampling import sample_motion_latents
            r_d = sample_motion_latents(
                params["fmt"], r_s, wa, we, cfg=cfg,
                noise=jnp.asarray(acts["noise"]))
            results.append(compare("r_d", r_d, acts["r_d"], *TOLERANCES["r_d"]))
            if "frames" in acts:
                frames = pipe.decode(s_r, feats, r_d)
                results.append(compare("frames", frames, acts["frames"],
                                       *TOLERANCES["frames"]))

    print(f"\n{sum(results)}/{len(results)} stages within tolerance")
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
