#!/usr/bin/env python
"""Probe-lane ceiling A/B: what does the flow-stats probe cost e2e?

The round-5 fusion-lane decomposition (PERF.md) attributes ~4.1 ms of the
~52 ms production chunk to the with_stats machinery: the flow_needed_disp
probe (~2.6 ms of elementwise/compare/reduce fusions over the full flow
grids) plus compare/select flag handling (~1.5 ms).  The probe is purely
ADVISORY — correctness comes from the in-kernel overflow flags + fixup
re-decode — so a steady-state decode could skip it once the warp ratchets
have converged.

This experiment measures the CEILING of that idea with zero machinery:
stub flow_needed_disp to a trace-time constant (XLA dead-code-eliminates
every probe fusion), clear the chunk-program jit cache, and A/B
pipe.generate same-session.  If the e2e win is under ~2% the steady-state
program variant is not worth a third dispatch mode (two recorded cases of
isolated wins losing e2e — PERF.md methodology).

AOT cache is disabled: its key hashes float_tpu SOURCE, not the traced
HLO, so the stubbed variant would wrongly reuse the production blobs.

    python experiments/probe_lane_bench.py
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ["FLOAT_AOT_CACHE"] = ""          # live traces for BOTH variants

import jax
import jax.numpy as jnp

from float_tpu.config import FloatConfig
from float_tpu.runtime.pipeline import (build_synthetic_pipeline,
                                        audio_num_frames)


def _timed(pipe, img, waves, reps=3):
    t0 = time.perf_counter()
    for i in range(reps):
        frames = pipe.generate(img, waves[i % len(waves)], emotion="none",
                               seed=15 + i)
    float(jnp.sum(frames[0, 0, 0]))
    return (time.perf_counter() - t0) / reps


def main():
    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
    pipe = build_synthetic_pipeline(cfg)
    rng = np.random.default_rng(0)
    n_samples = 160000
    t_frames = audio_num_frames(n_samples, cfg)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512))
                      .astype(np.float32) * 0.3)
    waves = [jnp.asarray(rng.standard_normal((1, n_samples))
                         .astype(np.float32) * 0.1) for _ in range(3)]

    # ---- A: production program (probe live) ----
    for w in range(len(waves) + 1):          # warm: programs + ratchets
        frames = pipe.generate(img, waves[w % len(waves)], emotion="none",
                               seed=15 + w % len(waves))
        float(jnp.sum(frames[0, 0, 0]))
    dt_a = _timed(pipe, img, waves)
    print(f"# A (probe live):   {dt_a:.3f} s/clip = "
          f"{t_frames / dt_a:.1f} fps", file=sys.stderr)

    # ---- B: probe stubbed to a trace-time constant ----
    from float_tpu.ops import nhwc
    from float_tpu.runtime import decode
    orig = nhwc.flow_needed_disp
    nhwc.flow_needed_disp = lambda grid, h, w: jnp.asarray(0, jnp.int32)
    decode._decode_chunk.clear_cache()       # force retrace of chunk fns
    try:
        for w in range(len(waves) + 1):      # recompile + re-settle
            frames = pipe.generate(img, waves[w % len(waves)],
                                   emotion="none",
                                   seed=15 + w % len(waves))
            float(jnp.sum(frames[0, 0, 0]))
        dt_b = _timed(pipe, img, waves)
    finally:
        nhwc.flow_needed_disp = orig
        decode._decode_chunk.clear_cache()
    print(f"# B (probe stubbed): {dt_b:.3f} s/clip = "
          f"{t_frames / dt_b:.1f} fps", file=sys.stderr)

    print(json.dumps({
        "fps_probe_live": round(t_frames / dt_a, 1),
        "fps_probe_stubbed": round(t_frames / dt_b, 1),
        "speedup": round(dt_a / dt_b, 4),
        "ms_per_clip_delta": round((dt_a - dt_b) * 1e3, 1),
        "ms_per_chunk_delta": round((dt_a - dt_b) * 1e3 / 11, 2),
    }))


if __name__ == "__main__":
    main()
