#!/usr/bin/env python
"""A/B: scan-bucketed sampling vs chunk-by-chunk sampling in `generate`
(VERDICT r3 #6).

A = today's generate: one lax.scan sampler program per CHUNK-COUNT BUCKET
    (bucket_n_chunks rounds n>5 up to multiples of 5 — an unlucky length
    like n=6 integrates 10 chunks, +67% sampler work), then decode.
B = the streaming path's sampler: python loop over the ONE per-chunk
    program (sampling.sample_motion_chunk), exact chunk count, same noise
    (chunk_noise fold_in) -> identical latents; decode unchanged
    (optimistic decode_latents — NOT the stream's fixup program).

On one chip the device serializes either way, so B's win is exactly the
padded-chunk waste + per-bucket recompiles; this measures both at a
bucket-aligned length (10 s: n=5), an unlucky one (12.4 s: n=7 -> bucket
10), and config-3 length (60 s: n=30, aligned).

Timing per PERF.md methodology: warm twice, timed reps back-to-back, one
scalar readback.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FLOAT_AOT_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".aot_cache"))

import jax
import jax.numpy as jnp

from float_tpu.config import FloatConfig
from float_tpu.runtime.pipeline import build_synthetic_pipeline, audio_num_frames


def sync(x):
    return float(jnp.sum(x[0, 0, 0] if x.ndim == 4 else x))


def generate_b(pipe, img, wave, *, seed):
    """Variant B: chunk-by-chunk sampler + the normal optimistic decode."""
    import math
    from float_tpu.models.fmt import infer_cfg_mode
    from float_tpu.runtime.sampling import (sampler_init_carry, chunk_noise,
                                            pad_to_chunks)
    from float_tpu.runtime.decode import decode_latents

    cfg = pipe.cfg
    t_frames = audio_num_frames(wave.shape[-1], cfg)
    s_r, _lam, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t_frames)
    we = pipe.emotion_latent(wave, "none")
    mode = infer_cfg_mode(cfg.a_cfg_scale, cfg.r_cfg_scale,
                          cfg.e_cfg_scale, cfg.include_r_cfg)
    key = jax.random.key(seed)
    clip = cfg.num_frames_for_clip
    n_chunks = math.ceil(t_frames / clip)
    b = wa.shape[0]
    wa_p = pad_to_chunks(wa, clip)
    carry = sampler_init_carry(b, cfg, jnp.dtype(cfg.sampler_dtype))
    pieces = []
    for c in range(n_chunks):
        x0 = chunk_noise(key, c, b, cfg, wa.dtype)
        wa_t = jax.lax.dynamic_slice_in_dim(wa_p, c * clip, clip, 1)
        piece, carry = pipe._sample_chunk(
            pipe.params["fmt"], r_s, wa_t, we, carry, x0,
            jnp.float32(cfg.a_cfg_scale), jnp.float32(cfg.e_cfg_scale),
            jnp.float32(cfg.r_cfg_scale),
            nfe=cfg.nfe, method=cfg.ode_method, cfg_mode=mode)
        pieces.append(piece[0])
    r_d = jnp.concatenate(pieces, axis=0)[:t_frames]
    return decode_latents(
        pipe._syn_cast, s_r, feats, r_d, size=cfg.input_size,
        decode_batch=cfg.decode_batch,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        chunk_fn=pipe._chunk_fn, use_warp_kernel=cfg.use_pallas)


def main():
    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
    pipe = build_synthetic_pipeline(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512))
                      .astype(np.float32) * 0.3)

    print(f"device={jax.devices()[0]}", file=sys.stderr)
    # NOTE: 60 s is NOT included — a device-resident 1500-frame f32 clip
    # is ~4.7 GB and OOMs next to the params (generate is documented for
    # moderate clips; long clips stream).  20 s (n=10, aligned) stands in
    # for the long-clip trend.
    for label, sec in (("10s n=5 aligned", 10.0),
                       ("12.4s n=7->bucket10", 12.4),
                       ("20s n=10 aligned", 20.0)):
        n = int(sec * 16000)
        wave = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)
        t = audio_num_frames(n, cfg)
        rows = {}
        for name, fn in (("A_scan", lambda s: pipe.generate(
                              img, wave, emotion="none", seed=s)),
                         ("B_chunked", lambda s: generate_b(
                              pipe, img, wave, seed=s))):
            for w in range(2):
                sync(fn(15 + w))
            reps = 3 if sec < 30 else 1
            t0 = time.perf_counter()
            for i in range(reps):
                f = fn(15 + i)
            sync(f)
            rows[name] = (time.perf_counter() - t0) / reps
        ref = np.asarray(pipe.generate(img, wave, emotion="none", seed=3))
        got = np.asarray(generate_b(pipe, img, wave, seed=3))
        exact = np.allclose(got, ref, atol=2e-3)
        a, b = rows["A_scan"], rows["B_chunked"]
        print(f"{label:24s} frames={t:4d}  A(scan)={a:.3f}s "
              f"({t / a:.1f} fps)  B(chunked)={b:.3f}s ({t / b:.1f} fps)  "
              f"B/A={b / a:.3f}  outputs_match={exact}")


if __name__ == "__main__":
    main()
