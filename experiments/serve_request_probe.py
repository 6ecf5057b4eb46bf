#!/usr/bin/env python
"""Why does one 4 s /v1/generate request cost ~36 s of device-busy time
(serve_load_bench r4) when the wire+compute budget is ~5 s?  Stage-level
timing of float_process + write_video, no HTTP.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FLOAT_AOT_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".aot_cache"))

from float_tpu.config import FloatConfig
from float_tpu.api.types import FloatPipe
from float_tpu.api.nodes import float_process
from float_tpu.runtime.pipeline import build_synthetic_pipeline


def main():
    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
    fp = FloatPipe(build_synthetic_pipeline(cfg), cfg, weights="synthetic")
    rng = np.random.default_rng(0)
    img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
    wave = (rng.standard_normal(64000) * 0.1).astype(np.float32)

    marks = []

    def progress(stage, i=None, n=None):
        marks.append((time.perf_counter(), stage, i, n))

    for rep in range(3):
        marks.clear()
        t0 = time.perf_counter()
        frames, _audio, fps = float_process(img[None], wave[None], fp,
                                            seed=20 + rep,
                                            progress=progress)
        dt = time.perf_counter() - t0
        last = t0
        stages = []
        for ts, stage, i, n in marks:
            stages.append(f"{stage}{'' if i is None else f'[{i}/{n}]'} "
                          f"+{ts - last:.2f}s")
            last = ts
        print(f"rep{rep}: float_process {dt:.2f}s for {frames.shape[0]} "
              f"frames\n  " + " | ".join(stages), flush=True)

        t0 = time.perf_counter()
        from float_tpu.io.video import write_video
        write_video("/tmp/probe.mp4", frames, fps, audio=wave,
                    sample_rate=16000)
        print(f"  write_video {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
