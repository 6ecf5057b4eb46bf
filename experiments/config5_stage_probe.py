#!/usr/bin/env python
"""Where do config 5's 360 s go?  Per-stage wall timing of the two-face
insert flow at full size on the real chip (r4).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FLOAT_AOT_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".aot_cache"))

import jax.numpy as jnp

from float_tpu.config import FloatConfig
from float_tpu.image.face_align import face_align_crop
from float_tpu.image.composite import composite_face_frames
from float_tpu.runtime.pipeline import build_synthetic_pipeline, audio_num_frames


def main():
    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
    pipe = build_synthetic_pipeline(cfg)
    rng = np.random.default_rng(0)
    scene = (rng.random((768, 1024, 3)) * 255).astype(np.uint8)
    BOXES = [(150.0, 200.0, 350.0, 420.0, 0.99),
             (620.0, 180.0, 840.0, 430.0, 0.98)]
    det = lambda im: [(x1 * im.shape[0] / 768, y1 * im.shape[0] / 768,  # noqa: E731
                       x2 * im.shape[0] / 768, y2 * im.shape[0] / 768, s)
                      for x1, y1, x2, y2, s in BOXES]
    wave = jnp.asarray(rng.standard_normal((1, 160000)).astype(np.float32) * 0.1)
    t = audio_num_frames(160000, cfg)

    def sync(x):
        return float(jnp.sum(x[0, 0, 0] if x.ndim == 4 else x))

    def run(seed, label):
        out = scene.astype(np.float32) / 255.0
        for idx in (1, 2):
            t0 = time.perf_counter()
            crop, bbox = face_align_crop(scene, cfg.input_size, index=idx,
                                         detector=det)
            t_align = time.perf_counter() - t0

            model_in = jnp.asarray((crop.astype(np.float32) / 127.5 - 1.0)
                                   .transpose(2, 0, 1)[None])
            t0 = time.perf_counter()
            s_r, _lam, feats, r_s = pipe.encode_image(model_in)
            sync(feats[0])
            t_enc = time.perf_counter() - t0

            t0 = time.perf_counter()
            wa = pipe.encode_audio(wave, t)
            we = pipe.emotion_latent(wave, "none")
            r_d = pipe.sample(r_s, wa, we, seed=seed + idx)
            sync(r_d)
            t_sample = time.perf_counter() - t0

            t0 = time.perf_counter()
            frames = pipe.decode_to_host(s_r, feats, r_d)
            t_dec = time.perf_counter() - t0

            t0 = time.perf_counter()
            out = composite_face_frames(out, frames, bbox,
                                        inplace=out.ndim == 4)
            t_comp = time.perf_counter() - t0
            print(f"{label} face{idx}: align {t_align:.2f}s | img-enc "
                  f"{t_enc:.2f}s | audio+sample {t_sample:.2f}s | "
                  f"decode_to_host {t_dec:.2f}s | composite {t_comp:.2f}s",
                  flush=True)
        return out

    run(15, "warm")
    t0 = time.perf_counter()
    out = run(16, "timed")
    dt = time.perf_counter() - t0
    assert out.shape == (t, 768, 1024, 3) and np.isfinite(out).all()
    print(f"TOTAL timed: {dt:.1f}s for {2 * t} frames "
          f"({2 * t / dt:.1f} fps)")


if __name__ == "__main__":
    main()
