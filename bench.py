"""Benchmark: end-to-end talking-head generation throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config = BASELINE.json config 1: 512×512 portrait + 10 s audio @ 16 kHz,
wav2vec2-base audio encoder, SER emotion predictor, 10 Euler ODE steps,
25 fps => T = 250 frames.  Weights are synthetic when no checkpoint is
present (identical FLOP/shape profile to the real 617.5 M-param model).

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is >250 frames/s at 512² on one v5e chip, so vs_baseline is
value / 250.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _device_probe(timeout_s: int = 240):
    """Enumerate devices in a SUBPROCESS with a timeout: when the axon
    tunnel is down, in-process `jax.devices()` hangs indefinitely (PERF.md
    outage notes) — the bench must fail fast with an honest JSON line
    instead of hanging the driver.  Returns the platform name or None."""
    import subprocess
    code = "import jax; print(jax.devices()[0].platform)"
    try:
        p = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return None
    return p.stdout.strip().splitlines()[-1] if p.returncode == 0 else None


def _probe_with_retries(probe=_device_probe, retry_sleep_s: float = 45.0):
    """Retry the device probe a few times: tunnel glitches are often
    transient, and this is the round's one recorded measurement — worth
    waiting a bounded ~10 min for before giving up.  Returns the platform
    name or None."""
    retries = int(os.environ.get("FLOAT_BENCH_PROBE_RETRIES", "3"))
    for attempt in range(retries):
        platform = probe(timeout_s=180)
        if platform is not None:
            return platform
        if attempt + 1 < retries:
            print(f"# device probe attempt {attempt + 1}/{retries} "
                  "failed; retrying", file=sys.stderr)
            time.sleep(retry_sleep_s)
    return None


def main():
    if os.environ.get("FLOAT_BENCH_SKIP_PROBE") != "1":
        platform = _probe_with_retries()
        if platform is None:
            retries = os.environ.get("FLOAT_BENCH_PROBE_RETRIES", "3")
            print(json.dumps({
                "metric": "frames_per_second_512px",
                "value": None, "unit": "frames/s/chip", "vs_baseline": None,
                "error": "device enumeration failed/hung (axon tunnel "
                         f"down?) after {retries} attempts — no "
                         "measurement taken"}))
            sys.exit(1)

    # Cross-process AOT executable cache: the axon transport's compile
    # keys are per-session, so without this every bench process pays the
    # full multi-minute cold start (PERF.md).  Safe by construction —
    # keys include a float_tpu source fingerprint, host ISA, and device
    # kind, and any load/dispatch failure falls back to a fresh compile
    # (utils/aot_cache.py).  Opt out with FLOAT_AOT_CACHE="".
    os.environ.setdefault(
        "FLOAT_AOT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".aot_cache"))

    import jax
    import jax.numpy as jnp

    from float_tpu.config import FloatConfig
    from float_tpu.runtime.pipeline import build_synthetic_pipeline, audio_num_frames
    from float_tpu.io.checkpoint import load_unified_checkpoint
    from float_tpu.runtime.pipeline import FloatPipeline

    cfg = FloatConfig(compute_dtype="bfloat16",
                      decode_batch=int(os.environ.get("FLOAT_DECODE_BATCH",
                                                      "24")),
                      sampler_dtype=os.environ.get("FLOAT_SAMPLER_DTYPE",
                                                   "float32"))

    ckpt = os.environ.get("FLOAT_CKPT", "models/float/FLOAT.safetensors")
    if os.path.exists(ckpt):
        params = load_unified_checkpoint(ckpt)
        pipe = FloatPipeline(params, cfg)
        weights = "real"
    else:
        pipe = build_synthetic_pipeline(cfg)
        weights = "synthetic"

    rng = np.random.default_rng(0)
    n_samples = 160000                       # 10 s @ 16 kHz
    t_frames = audio_num_frames(n_samples, cfg)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512)).astype(np.float32) * 0.3)
    waves = [jnp.asarray(rng.standard_normal((1, n_samples)).astype(np.float32) * 0.1)
             for _ in range(3)]

    # warm-up / compile: cover every (wave, seed) the timed loop uses —
    # each clip's flow stats can ratchet the warp kernels' static D
    # (runtime/decode.py), and a ratchet bump inside the timed loop would
    # trigger a recompile there
    # (the scalar-readback sync program is warmed too: its first compile
    # costs ~0.4 s on this transport)
    for w in range(len(waves) + 1):
        frames = pipe.generate(img, waves[w % len(waves)], emotion="none",
                               seed=15 + w % len(waves))
        float(jnp.sum(frames[0, 0, 0]))
        np.asarray(frames[-1])               # force full materialization

    # timed throughput: clips dispatch back-to-back (the serving shape) and
    # ONE data-dependent scalar readback closes the pipeline — the device
    # executes in dispatch order, so the final sum transitively waits for
    # every clip.  block_until_ready is NOT a sync on the axon tunnel
    # (returns early, CLAUDE.md); a per-clip readback instead measures
    # serialized latency (~4% higher: host dispatch can't overlap decode).
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        frames = pipe.generate(img, waves[i % len(waves)], emotion="none",
                               seed=15 + i)
    float(jnp.sum(frames[0, 0, 0]))
    dt = (time.perf_counter() - t0) / reps

    fps = t_frames / dt
    # analytic MFU accounting (utils/flops.py): decode MXU work dominates;
    # the sampler's CFG-ODE FLOPs add ~3.5%; VPU warp/blur work is
    # reported per frame but kept OUT of the MXU-peak ratio
    from float_tpu.utils.flops import (synthesis_flops_per_frame,
                                       sampling_flops_per_clip,
                                       V5E_BF16_PEAK_FLOPS)
    syn = synthesis_flops_per_frame(cfg.input_size)
    clip_flops = syn["mxu_flops"] * t_frames + sampling_flops_per_clip(
        t_frames, cfg)
    result = {
        "metric": "e2e_frames_per_sec_512px",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 250.0, 3),
        "mfu": round(clip_flops / dt / V5E_BF16_PEAK_FLOPS, 4),
        "achieved_tflops": round(clip_flops / dt / 1e12, 2),
        "gflop_per_frame_decode_mxu": round(syn["mxu_flops"] / 1e9, 2),
        "gflop_per_frame_decode_vpu": round(syn["vpu_flops"] / 1e9, 2),
    }
    print(json.dumps(result))
    print(f"# clip latency {dt:.3f}s for {t_frames} frames (10s audio), "
          f"weights={weights}, dtype={cfg.compute_dtype}, "
          f"decode_batch={cfg.decode_batch}, device={jax.devices()[0]}",
          file=sys.stderr)


def stream_main():
    """--stream: first-frame latency + sustained streamed throughput
    (VERDICT r3 #2).  Reports the HOST time-to-first-chunk, the measured
    tunnel wire time of one uint8 chunk (a dev-environment artifact —
    ~17 MB/s here vs PCIe in production), and their difference = the
    DEVICE-side first-frames latency.  Target: device-side <= 0.25 s."""
    os.environ.setdefault(
        "FLOAT_AOT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".aot_cache"))
    import jax
    import jax.numpy as jnp
    from float_tpu.config import FloatConfig
    from float_tpu.runtime.pipeline import (build_synthetic_pipeline,
                                            audio_num_frames)

    cfg = FloatConfig(compute_dtype="bfloat16",
                      decode_batch=int(os.environ.get("FLOAT_DECODE_BATCH",
                                                      "24")))
    pipe = build_synthetic_pipeline(cfg)
    rng = np.random.default_rng(0)
    n_samples = 160000
    t_frames = audio_num_frames(n_samples, cfg)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512))
                      .astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, n_samples))
                       .astype(np.float32) * 0.1)

    first = int(os.environ.get("FLOAT_STREAM_FIRST_CHUNK", "8"))

    # warm TWICE: programs + warp ratchets (PERF.md bench note)
    for _ in range(2):
        for _s, _f in pipe.generate_stream(img, wave, emotion="none",
                                           seed=15, first_chunk=first):
            pass

    # pure wire time of one FIRST-chunk uint8 transfer: a FRESH device
    # array per rep (a jax Array caches its host copy after the first
    # np.asarray — re-transferring the same buffer measures nothing)
    mk = jax.jit(lambda i: jnp.full(
        (first, cfg.input_size, cfg.input_size, 3), i, jnp.uint8))
    wires = []
    for i in range(3):
        chunk_u8 = mk(i)
        float(jnp.sum(chunk_u8[0, 0, 0].astype(jnp.float32)))  # materialize
        t0 = time.perf_counter()
        np.asarray(chunk_u8)
        wires.append(time.perf_counter() - t0)
    wire = sorted(wires)[1]

    # timed: time-to-first-chunk (host) + sustained drain, 3 reps
    ttfc, totals = [], []
    for rep in range(3):
        t0 = time.perf_counter()
        gen = pipe.generate_stream(img, wave, emotion="none", seed=15,
                                   first_chunk=first)
        start, frames = next(gen)
        ttfc.append(time.perf_counter() - t0)
        n = frames.shape[0]
        assert n <= max(4, first)
        for _s, f in gen:
            n += f.shape[0]
        totals.append(time.perf_counter() - t0)
        assert n == t_frames and start == 0
    ttfc_host = sorted(ttfc)[1]
    total = sorted(totals)[1]
    device_side = max(0.0, ttfc_host - wire)

    # sustained drain on the 4:2:0 wire (the jpeg-delivery hop: HALF the
    # uint8 bytes through the host link, ops/yuv420.py) — on the ~17 MB/s
    # dev tunnel this is what bounds delivered fps
    yuv_totals = []
    for rep in range(2):
        t0 = time.perf_counter()
        n = 0
        for _s, f in pipe.generate_stream(img, wave, emotion="none",
                                          seed=15, first_chunk=first,
                                          wire="yuv420"):
            n += f.shape[0]
        yuv_totals.append(time.perf_counter() - t0)
        assert n == t_frames
    yuv_total = min(yuv_totals)

    result = {
        "metric": "stream_first_chunk_latency_512px",
        "value": round(device_side, 3),
        "unit": "s_device_side",
        "vs_baseline": round(0.25 / device_side, 3) if device_side else None,
        "ttfc_host_s": round(ttfc_host, 3),
        "wire_chunk_s": round(wire, 3),
        "first_chunk_frames": first,
        "sustained_fps_host_wire_bound": round(t_frames / total, 1),
        "sustained_fps_yuv420_wire": round(t_frames / yuv_total, 1),
    }
    print(json.dumps(result))
    print(f"# host TTFC {ttfc_host:.3f}s = device {device_side:.3f}s + "
          f"wire {wire:.3f}s ({first} frames uint8); full-drain "
          f"{total:.2f}s for {t_frames} frames (tunnel-bound); "
          f"yuv420-wire drain {yuv_total:.2f}s, "
          f"device={jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    if "--stream" in sys.argv:
        stream_main()
    else:
        main()
