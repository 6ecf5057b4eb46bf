#!/usr/bin/env python
"""First-request latency: cold compile stack vs AOT-warmed (VERDICT r4 #6).

Measures, in THIS fresh process, the serving cold-start path that
`cli serve --aot-dir ... --warm` runs before binding the port:

    build pipeline -> FloatPipeline.warmup() -> first real request

With --no-cache the AOT cache is disabled: warmup() pays the full XLA
compile stack (the reference equivalent is the first ComfyUI run's
warm-up, src/nodes/models/float/FLOAT.py:271-276 — but there it is
cuDNN autotune, not a 4-minute XLA image-encoder compile, so killing
this cost is on us).  With the cache present, warmup() deserializes the
AOT executables instead.  Run cache mode twice: the first populates any
missing keys, the second measures the true warm start.

    python tools/aot_cold_warm_bench.py [--no-cache] [--aot-dir DIR]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--aot-dir",
                    default=os.path.join(ROOT, ".aot_cache"))
    args = ap.parse_args()

    os.environ["FLOAT_AOT_CACHE"] = "" if args.no_cache else args.aot_dir
    t_start = time.perf_counter()
    import jax.numpy as jnp
    import numpy as np
    from float_tpu.config import FloatConfig
    from float_tpu.runtime.pipeline import build_synthetic_pipeline

    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
    pipe = build_synthetic_pipeline(cfg)
    t_build = time.perf_counter() - t_start

    t0 = time.perf_counter()
    warm_s = pipe.warmup()
    t_warm = time.perf_counter() - t0

    # "first real request": a clip length warmup() has NOT seen (4 s vs
    # warmup's 2 s) — the chunk-bucketed sampler may still compile for a
    # new bucket; the streaming programs warmed above cover any length
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 64000)).astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    frames = pipe.generate(img, wave, emotion="none", seed=15)
    float(jnp.sum(frames[0, 0, 0]))
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    frames = pipe.generate(img, wave, emotion="none", seed=16)
    float(jnp.sum(frames[0, 0, 0]))
    t_second = time.perf_counter() - t0

    print(json.dumps({
        "metric": "serve_cold_start",
        "aot_cache": not args.no_cache,
        "build_s": round(t_build, 1),
        "warmup_s": round(t_warm, 1),
        "first_request_s": round(t_first, 2),
        "second_request_s": round(t_second, 2),
        "ready_to_first_response_s": round(t_build + t_warm + t_first, 1),
    }))


if __name__ == "__main__":
    main()
