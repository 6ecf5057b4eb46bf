"""Per-op breakdown of ONE 512² decode chunk via jax.profiler.

PERF.md: profiler tracing distorts e2e ~3x on the axon transport — use
the numbers RELATIVELY (share of chunk time per op class), never as
absolute throughput.  Also prints un-traced chunk wall time for scale.

Usage: python experiments/chunk_breakdown.py [--trace-dir /tmp/trace]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def build_chunk_parts(decode_batch: int = 24):
    """Converge the ratchets and return the production chunk call's exact
    ingredients: (params_c, wa_full, feats_c, disp, paths, cfg)."""
    from float_tpu.config import FloatConfig
    from float_tpu.runtime.pipeline import build_synthetic_pipeline, audio_num_frames

    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=decode_batch)
    pipe = build_synthetic_pipeline(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 160000)).astype(np.float32) * 0.1)
    t = audio_num_frames(160000, cfg)
    s_r, _lam, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)
    we = pipe.emotion_latent(wave, "none")
    r_d = pipe.sample(r_s, wa, we, seed=15)[0]

    from float_tpu.runtime import decode as D
    # converge the D + path ratchets so we profile the PRODUCTION programs
    pipe.decode(s_r, feats, r_d[:64])
    dtype = jnp.bfloat16
    wa_full = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1)) for f in feats]
    params_c = pipe._syn_cast
    disp = D._ratchet_get(512)
    paths = D._path_get(512)
    print("ratchet D:", disp, "paths:", paths)
    return params_c, wa_full, feats_c, disp, paths, cfg


def build_chunk(decode_batch: int = 24):
    from float_tpu.runtime import decode as D
    params_c, wa_full, feats_c, disp, paths, cfg = build_chunk_parts(decode_batch)

    def chunk(wa_c):
        return D._decode_chunk(params_c, wa_c, feats_c, 512,
                               warp_disp=disp, with_stats=True, fixup=False,
                               warp_path=paths)

    def hlo(wa_c):
        """Optimized HLO text of the exact production chunk program."""
        return D._decode_chunk.lower(
            params_c, wa_c, feats_c, 512, warp_disp=disp, with_stats=True,
            fixup=False, warp_path=paths).compile().as_text()

    return chunk, hlo, wa_full, cfg


def parse_trace(trace_dir):
    """Aggregate device op times from the xplane-exported trace.json.gz."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace.json.gz found under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU" and "XLA Ops"-style tids
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n}
    agg = defaultdict(float)
    full = defaultdict(float)
    # (engine-kind, res) aggregation from the events' own metadata
    # (hlo_category + long_name shapes) — ground truth per executed op,
    # immune to the trace-name vs HLO-text numbering misalignment that
    # misattributed the r5 first pass (VERDICT r4 weak #7)
    kind_agg = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ms, n, GB, GF
    detail = defaultdict(lambda: [0.0, 0.0, 0.0, ""])
    total = 0.0
    import re
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3          # us -> ms
        base = name.split(".")[0].split("(")[0]
        agg[base] += dur
        if base != "jit__chunk_core":        # parent lane double-counts
            full[name.split("(")[0]] += dur
            args = e.get("args", {})
            cat = args.get("hlo_category", base)
            long = args.get("long_name", "")
            m = re.match(r"%\S+ = \(?[a-z0-9]+\[([0-9,]*)\]", long)
            res = 0
            if m:
                dims = [int(d) for d in m.group(1).split(",") if d]
                res = dims[1] if len(dims) >= 3 else (dims + [0])[0]
            gb = float(args.get("bytes_accessed", 0)) / 1e9
            gf = float(args.get("model_flops", 0)) / 1e9
            k = kind_agg[(cat, res)]
            k[0] += dur; k[1] += 1; k[2] += gb; k[3] += gf
            d = detail[name.split("(")[0]]
            d[0] += dur; d[1] += gb; d[2] += gf
            d[3] = f"{cat} @{res}"
        total += dur
    print(f"\n== device op classes ({os.path.basename(path)}) ==")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {name}")
    print(f"{total:9.2f} ms  total device (traced, distorted)")

    print("\n== (hlo_category, out-res) lanes — ms | n | GB | GF | "
          "GB/s | TF/s ==")
    for (cat, res), (ms, n, gb, gf) in sorted(
            kind_agg.items(), key=lambda kv: -kv[1][0])[:25]:
        bw = gb / (ms / 1e3) if ms else 0.0
        tf = gf / (ms / 1e3) / 1e3 if ms else 0.0
        print(f"{ms:9.2f} ms  n={n:4d}  {gb:7.2f} GB  {gf:8.1f} GF  "
              f"{bw:7.1f} GB/s  {tf:6.2f} TF/s  {cat} @{res}")

    print("\n== top individual ops (ms | GB | GF | category@res) ==")
    for name, (ms, gb, gf, cat) in sorted(
            detail.items(), key=lambda kv: -kv[1][0])[:25]:
        bw = gb / (ms / 1e3) if ms else 0.0
        print(f"{ms:9.2f} ms  {gb:6.2f} GB {bw:7.1f} GB/s  "
              f"{gf:7.1f} GF  {name}  [{cat}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/chunk_trace")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--decode-batch", type=int, default=24)
    args = ap.parse_args()

    chunk, hlo, wa_full, cfg = build_chunk(args.decode_batch)
    fb = cfg.decode_batch
    navail = wa_full.shape[0] // fb          # full chunks in the clip

    # warm both programs + ratchet
    outs = [chunk(wa_full[i * fb:(i + 1) * fb]) for i in range(3)]
    float(jnp.sum(outs[-1][0][0, 0, 0].astype(jnp.float32)))

    # untraced wall time (chained, one sync)
    t0 = time.perf_counter()
    res = None
    for i in range(args.chunks):
        j = i % navail
        res = chunk(wa_full[j * fb:(j + 1) * fb])
    float(jnp.sum(res[0][0, 0, 0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.chunks
    print(f"untraced chunk: {dt*1e3:.1f} ms  "
          f"({fb/dt:.0f} frames/s decode-only)")

    with jax.profiler.trace(args.trace_dir):
        for i in range(4):
            j = i % navail
            res = chunk(wa_full[j * fb:(j + 1) * fb])
        float(jnp.sum(res[0][0, 0, 0].astype(jnp.float32)))
    parse_trace(args.trace_dir)


if __name__ == "__main__":
    main()
