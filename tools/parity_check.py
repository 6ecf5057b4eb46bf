#!/usr/bin/env python
"""Numeric-parity harness: compare per-stage outputs against recorded
reference activations (SURVEY §4 test-strategy item d).

Usage:
  1. Record activations from the reference implementation with
     tools/record_reference_activations.py (it can also synthesize a
     full-size checkpoint when no real one is available — no egress).
  2. Run:  python tools/parity_check.py acts.npz --checkpoint FLOAT.safetensors

Stages (any subset recorded is checked):
  s_r, r_s_lambda, r_s   image encoder + Direction
  wa                     wav2vec2-base + interpolation + projection
  we                     SER emotion softmax
  r_d                    chunked CFG-ODE sampling with the recorded noise
  frames_small           decode at trained-regime latent scale (strict)
  frames                 decode at raw x0 scale — judged relative to the
                         reference's own f32-vs-f64 conditioning floor
                         (frames_f64), since random weights + unit-variance
                         latents make the synthesis chaotically conditioned

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
    "frames_small": (2e-2, 2e-2),
    "frames": (2e-2, 2e-2),
}
FLOOR_FACTOR = 4.0       # frames pass if err <= FLOOR_FACTOR * f32-vs-f64 floor


def compare(name, got, ref, atol, rtol, floor=None):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    if got.shape != ref.shape:
        print(f"FAIL {name}: shape {got.shape} != {ref.shape}")
        return False
    err = np.abs(got - ref)
    rel = err / (np.abs(ref) + 1e-6)
    ok = bool((err <= atol + rtol * np.abs(ref)).all())
    note = ""
    if not ok and floor is not None:
        # conditioning floor: mine-vs-ref-f32 must stay within FLOOR_FACTOR
        # of the clip's own ref-f32-vs-ref-f64 spread.  (The comparison is
        # clip-global: per-frame floors fluctuate randomly — a frame where
        # two roundings happen to agree is not evidence that a third must.)
        fl = float(np.abs(floor).max())
        ok = float(err.max()) <= max(FLOOR_FACTOR * fl, atol)
        e_t = err.reshape(err.shape[0], -1).max(axis=1)
        f_t = np.abs(floor).reshape(floor.shape[0], -1).max(axis=1)
        ratio = e_t / np.maximum(f_t, atol / FLOOR_FACTOR)
        note = (f"  [conditioning floor (ref f32-vs-f64): max={fl:.3e}, "
                f"ours/floor={err.max() / max(fl, 1e-12):.2f}x "
                f"(per-frame median {np.median(ratio):.2f}x), "
                f"pass<={FLOOR_FACTOR}x]")
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|err|={err.max():.3e} "
          f"max rel={rel.max():.3e} (atol={atol}, rtol={rtol}){note}")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("activations", help=".npz with recorded reference tensors")
    ap.add_argument("--checkpoint", default="models/float/FLOAT.safetensors")
    ap.add_argument("--emotion", default="none")
    ap.add_argument("--a-cfg", type=float, default=2.0)
    ap.add_argument("--e-cfg", type=float, default=1.3)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. 'cpu'); default = env")
    ap.add_argument("--precision", default=None,
                    help="jax default matmul precision; on TPU pass "
                         "'highest' so f32 matmuls/convs use multi-pass "
                         "bf16 (default single-pass fails fp32 tolerances)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
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
                a_cfg_scale=args.a_cfg, e_cfg_scale=args.e_cfg,
                noise=jnp.asarray(acts["noise"]))
            results.append(compare("r_d", r_d, acts["r_d"], *TOLERANCES["r_d"]))

    if "r_d_dyn" in acts and "noise_dyn" in acts:
        from float_tpu.runtime.sampling import sample_motion_latents
        r_d_dyn = sample_motion_latents(
            params["fmt"], r_s, wa, jnp.asarray(acts["we_dyn"]), cfg=cfg,
            a_cfg_scale=args.a_cfg, e_cfg_scale=args.e_cfg,
            noise=jnp.asarray(acts["noise_dyn"]))
        results.append(compare("r_d_dyn", r_d_dyn, acts["r_d_dyn"],
                               *TOLERANCES["r_d"]))

    # decode stages use the RECORDED r_d so decode parity is isolated from
    # sampling drift (which the chaotic random-weight synthesis amplifies)
    if "frames_small" in acts and "r_d_small" in acts:
        frames = pipe.decode(s_r, feats, jnp.asarray(acts["r_d_small"]))
        floor_s = (acts["frames_small"] - acts["frames_small_f64"]
                   if "frames_small_f64" in acts else None)
        results.append(compare("frames_small", frames, acts["frames_small"],
                               *TOLERANCES["frames_small"], floor=floor_s))
    if "frames" in acts:
        frames = pipe.decode(s_r, feats, jnp.asarray(acts["r_d"]))
        floor = (acts["frames"] - acts["frames_f64"]
                 if "frames_f64" in acts else None)
        results.append(compare("frames", frames, acts["frames"],
                               *TOLERANCES["frames"], floor=floor))

    print(f"\n{sum(results)}/{len(results)} stages within tolerance")
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
