#!/usr/bin/env python
"""Serving daemon under a 2-client load on the real chip (VERDICT r3 #1).

Starts the HTTP daemon in-process on the full-size synthetic pipeline,
drives it with two concurrent clients (one mp4 one-shot lane, one NDJSON
streaming lane), then prints the /metrics table PERF.md records: request
latency percentiles, lock-wait percentiles, frames/busy-second vs the
solo bench.py number.

    python tools/serve_load_bench.py [--clip-sec 4] [--reqs 3] [--port 0]
        [--overload] [--soak-sec N]

Lanes:
- base 2-client load (mp4 one-shot + NDJSON stream), as in round 4;
- delivered-fps A/B: solo raw stream vs encoding="jpeg" stream — the
  compressed delivery path must sustain >= real-time through the wire;
- --overload: clients > max_pending fired at once (expect real 503s
  with Retry-After) plus one deliberately STALLED mid-stream reader
  (expect a real stream_abort that frees the chip), then a validity
  probe — the admission-control/abort machinery on the real pipeline,
  not fake pipes (VERDICT r4 weak #4);
- --soak-sec N: N seconds of mixed traffic; reports request counts,
  error counts, and host RSS drift (memory stability).

Replaces the reference's serial one-at-a-time node loop
(/root/reference/src/nodes/nodes.py:189-211) with measured concurrent
serving.  The ~17 MB/s dev tunnel dominates WALL latency of any
frame-returning endpoint (PERF.md "Host-transfer reality check");
busy_seconds / frames_per_busy_second isolate the device-side cost, which
is what production (PCIe host) keeps.
"""
import argparse
import base64
import io
import json
import os
import sys
import threading
import time

import numpy as np


def _np_b64(arr) -> str:
    buf = io.BytesIO()
    np.save(buf, arr)
    return base64.b64encode(buf.getvalue()).decode()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _rss_mb() -> float:
    import resource
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip-sec", type=float, default=4.0)
    ap.add_argument("--reqs", type=int, default=3,
                    help="requests per client lane")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--overload", action="store_true",
                    help="overload lane: >max_pending concurrent clients "
                         "+ one stalled mid-stream reader")
    ap.add_argument("--soak-sec", type=float, default=0.0,
                    help="soak: mixed traffic for N seconds, RSS drift")
    ap.add_argument("--max-pending", type=int, default=4)
    args = ap.parse_args()

    os.environ.setdefault("FLOAT_AOT_CACHE",
                          os.path.join(ROOT, ".aot_cache"))
    import jax.numpy as jnp  # noqa: F401  (backend init before server)
    from float_tpu.config import FloatConfig
    from float_tpu.api.types import FloatPipe
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    from float_tpu.serve import make_server
    from float_tpu.client import FloatClient

    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=24)
    fp = FloatPipe(build_synthetic_pipeline(cfg), cfg, weights="synthetic")

    # short stall timeout + small buffer so the overload lane's stalled
    # reader actually fills the buffer and trips the abort in bench time
    httpd = make_server(fp, port=args.port, max_pending=args.max_pending,
                        stream_buffer_mb=48, stream_stall_timeout=20)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
    n = int(args.clip_sec * cfg.sampling_rate)
    audio = (rng.standard_normal(n) * 0.1).astype(np.float32)

    cli = FloatClient(f"http://127.0.0.1:{port}", timeout=3600)
    print(f"# server on :{port}, device={cli.health()['device']}",
          file=sys.stderr)

    # warm: programs + uint8 wire + the warp D/path ratchets — chaotic
    # synthetic flows walk the D ratchet ONE level-bump per clip, each
    # bump a ~12-25 s kernel recompile (PERF.md r4 serving note), so warm
    # until the ratchet state is stable for two consecutive rounds
    # (production seeds it from the readiness gate's warp_profile.json
    # instead).
    from float_tpu.runtime import decode as D
    t0 = time.perf_counter()
    prev = None
    for w in range(12):
        cli.generate(img, audio, seed=100 + w)
        for _s, _f in cli.stream(img, audio, seed=200 + w, first_chunk=8):
            pass
        cur = (D._ratchet_get(cfg.input_size), D._path_get(cfg.input_size))
        if cur == prev:
            break
        prev = cur
    # the jpeg delivery lane rides the yuv420 device wire — warm its
    # chunk programs + the host jpeg pool too, or the delivered-fps A/B
    # times a compile (observed: 7.8 "fps" with the compile inside)
    for _s, _f in cli.stream(img, audio, seed=200, first_chunk=8,
                             encoding="jpeg", quality=85):
        pass
    print(f"# warm done in {time.perf_counter() - t0:.1f}s "
          f"({w + 1} rounds, ratchet {prev})", file=sys.stderr)
    # drop warm-phase samples (multi-minute compiles) from the server's
    # latency percentiles: the load numbers should describe the LOAD
    srv = httpd.RequestHandlerClass.srv
    srv.latency.reset()
    srv.lock_wait.reset()
    base = cli.metrics()

    results = {"mp4": [], "stream": [], "ttfc": []}
    errs = []

    def one_shot_lane():
        c = FloatClient(f"http://127.0.0.1:{port}", timeout=3600)
        for i in range(args.reqs):
            t0 = time.perf_counter()
            try:
                blob = c.generate(img, audio, seed=20 + i)
                assert len(blob) > 0
                results["mp4"].append(time.perf_counter() - t0)
            except Exception as e:      # noqa: BLE001 — record, don't die
                errs.append(f"mp4[{i}]: {e}")

    def stream_lane():
        c = FloatClient(f"http://127.0.0.1:{port}", timeout=3600)
        for i in range(args.reqs):
            t0 = time.perf_counter()
            try:
                nf, first = 0, None
                for _start, frames in c.stream(img, audio, seed=40 + i,
                                               first_chunk=8):
                    if first is None:
                        first = time.perf_counter() - t0
                    nf += frames.shape[0]
                results["stream"].append(time.perf_counter() - t0)
                results["ttfc"].append(first)
            except Exception as e:      # noqa: BLE001
                errs.append(f"stream[{i}]: {e}")

    threads = [threading.Thread(target=one_shot_lane),
               threading.Thread(target=stream_lane)]
    wall0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - wall0

    m = cli.metrics()

    def med(xs):
        return round(sorted(xs)[len(xs) // 2], 3) if xs else None

    # -- delivered-fps A/B: raw vs jpeg stream encoding (solo client,
    # best of 2 — the dev tunnel's throughput wanders ±10% and a single
    # pass can catch a bad patch) ----------------------------------------
    deliv = {}
    for enc in ("raw", "jpeg"):
        kw = {} if enc == "raw" else {"encoding": "jpeg", "quality": 85}
        best = None
        for rep in range(2):
            t0 = time.perf_counter()
            nf = 0
            for _s, frames in cli.stream(img, audio, seed=77 + rep,
                                         first_chunk=8, **kw):
                nf += frames.shape[0]
            dt = time.perf_counter() - t0
            if best is None or dt < best[0]:
                best = (dt, nf)
        dt, nf = best
        deliv[enc] = {"frames": nf, "wall_s": round(dt, 2),
                      "delivered_fps": round(nf / dt, 1)}
    # wire bytes per frame (loopback hides the network; report size)
    import urllib.request as _ur
    body = json.dumps({"image": _np_b64(img), "audio": _np_b64(audio),
                       "stream": True, "seed": 78, "encoding": "jpeg",
                       "quality": 85, "first_chunk": 8}).encode()
    rq = _ur.Request(f"http://127.0.0.1:{port}/v1/generate", data=body,
                     headers={"Content-Type": "application/json"})
    jpeg_bytes = raw_est = 0
    with _ur.urlopen(rq, timeout=3600) as r:
        for line in r:
            jpeg_bytes += len(line)
            sh = json.loads(line)["shape"]
            raw_est += int(np.prod(sh) * 4 / 3) + 120
    nfr = deliv["jpeg"]["frames"]
    deliv["jpeg"]["wire_kb_per_frame"] = round(jpeg_bytes / nfr / 1024, 1)
    deliv["raw"]["wire_kb_per_frame"] = round(raw_est / nfr / 1024, 1)

    # -- overload lane: saturate admission control + stall a reader ------
    overload = None
    if args.overload:
        import http.client
        base_m = cli.metrics()
        burst_n = args.max_pending + 3
        codes = []
        cl = threading.Lock()

        def burst(i):
            c = FloatClient(f"http://127.0.0.1:{port}", timeout=3600)
            try:
                blob = c.generate(img, audio, seed=300 + i)
                with cl:
                    codes.append(("ok", len(blob)))
            except Exception as e:   # noqa: BLE001
                code = getattr(e, "code", None)
                with cl:
                    codes.append((f"http{code}" if code else "err", str(e)))

        # the stalled reader: read ONE line, then hold the socket open
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/v1/generate", body=json.dumps(
            {"image": _np_b64(img), "audio": _np_b64(audio),
             "stream": True, "seed": 299}).encode(),
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        resp.readline()               # accept one line, then stall

        ts = [threading.Thread(target=burst, args=(i,))
              for i in range(burst_n)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # wait out the stall abort
        deadline = time.time() + 90
        while (cli.metrics()["stream_aborts"]
               <= base_m["stream_aborts"]) and time.time() < deadline:
            time.sleep(1.0)
        conn.close()
        m2 = cli.metrics()
        ok = [c for c in codes if c[0] == "ok"]
        rej = [c for c in codes if c[0] == "http503"]
        # validity probe: the chip serves cleanly right after the chaos
        blob = cli.generate(img, audio, seed=999)
        overload = {
            "burst_clients": burst_n,
            "max_pending": args.max_pending,
            "ok": len(ok), "rejected_503": len(rej),
            "other_errors": [c for c in codes
                             if c[0] not in ("ok", "http503")],
            "all_ok_valid_mp4": all(n > 1000 for _tag, n in ok),
            "stream_aborts_delta": m2["stream_aborts"]
            - base_m["stream_aborts"],
            "post_overload_probe_ok": len(blob) > 1000,
            "wall_s": round(time.perf_counter() - t0, 1),
        }

    # -- soak: mixed traffic for N seconds -------------------------------
    soak = None
    if args.soak_sec > 0:
        rss0 = _rss_mb()
        base_m = cli.metrics()
        stop = time.time() + args.soak_sec
        serrs = []
        counts = {"mp4": 0, "stream": 0, "jpeg": 0}

        def soak_lane(kind):
            c = FloatClient(f"http://127.0.0.1:{port}", timeout=3600)
            i = 0
            while time.time() < stop:
                i += 1
                try:
                    if kind == "mp4":
                        assert len(c.generate(img, audio,
                                              seed=1000 + i)) > 1000
                    else:
                        kw = ({"encoding": "jpeg"} if kind == "jpeg"
                              else {})
                        nf = sum(f.shape[0] for _s, f in c.stream(
                            img, audio, seed=2000 + i, **kw))
                        assert nf == int(args.clip_sec * cfg.fps), nf
                    counts[kind] += 1
                except Exception as e:   # noqa: BLE001
                    code = getattr(e, "code", None)
                    if code == 503:
                        time.sleep(2.0)   # honest backoff lane
                    else:
                        serrs.append(f"{kind}[{i}]: {e}")

        lanes = [threading.Thread(target=soak_lane, args=(k,))
                 for k in ("mp4", "stream", "jpeg")]
        t0 = time.perf_counter()
        for t in lanes:
            t.start()
        for t in lanes:
            t.join()
        m3 = cli.metrics()
        soak = {
            "seconds": round(time.perf_counter() - t0, 1),
            "completed": counts,
            "frames": m3["frames"] - base_m["frames"],
            "errors": serrs[:10],
            "error_count": len(serrs),
            "rejected_503": m3["rejected_busy"] - base_m["rejected_busy"],
            "rss_start_mb": round(rss0, 1),
            "rss_end_mb": round(_rss_mb(), 1),
        }

    httpd.shutdown()

    frames = m["frames"] - base["frames"]
    busy = m["busy_seconds"] - base["busy_seconds"]
    out = {
        "metric": "serve_2client_load",
        "clip_sec": args.clip_sec,
        "requests": 2 * args.reqs,
        "errors": errs,
        "wall_s": round(wall, 2),
        "frames": frames,
        "frames_per_busy_second": round(frames / busy, 1) if busy else None,
        "busy_seconds": round(busy, 2),
        "client_med_mp4_s": med(results["mp4"]),
        "client_med_stream_s": med(results["stream"]),
        "client_med_ttfc_s": med(results["ttfc"]),
        "latency_seconds": m["latency_seconds"],
        "lock_wait_seconds": m["lock_wait_seconds"],
        "rejected_busy": m.get("rejected_busy", 0),
        "delivered": deliv,
        "overload": overload,
        "soak": soak,
    }
    print(json.dumps(out))

    lat, lw = m["latency_seconds"], m["lock_wait_seconds"]
    rows = [
        "| quantity | value |", "|---|---|",
        f"| requests (2 clients × {args.reqs}, {args.clip_sec:g}s clips) "
        f"| {2 * args.reqs} ok, {len(errs)} errors |",
        f"| wall for the whole load | {wall:.1f} s |",
        f"| frames / device-busy-second | "
        f"{out['frames_per_busy_second']} |",
        f"| request latency p50 / p90 / p99 | {lat.get('p50')} / "
        f"{lat.get('p90')} / {lat.get('p99')} s |",
        f"| lock-wait p50 / p90 / p99 | {lw.get('p50')} / {lw.get('p90')} "
        f"/ {lw.get('p99')} s |",
        f"| stream time-to-first-chunk (client, med) | "
        f"{out['client_med_ttfc_s']} s |",
        f"| 503 rejections | {out['rejected_busy']} |",
        f"| delivered fps raw / jpeg | "
        f"{deliv['raw']['delivered_fps']} / "
        f"{deliv['jpeg']['delivered_fps']} |",
        f"| wire KB/frame raw / jpeg | "
        f"{deliv['raw']['wire_kb_per_frame']} / "
        f"{deliv['jpeg']['wire_kb_per_frame']} |",
    ]
    if overload:
        rows += [
            f"| overload: {overload['burst_clients']} clients vs "
            f"max_pending {overload['max_pending']} | {overload['ok']} ok, "
            f"{overload['rejected_503']} × 503, aborts "
            f"{overload['stream_aborts_delta']}, post-probe "
            f"{'ok' if overload['post_overload_probe_ok'] else 'FAIL'} |"]
    if soak:
        rows += [
            f"| soak {soak['seconds']}s | {soak['completed']} completed, "
            f"{soak['error_count']} errors, {soak['rejected_503']} × 503, "
            f"RSS {soak['rss_start_mb']} -> {soak['rss_end_mb']} MB |"]
    print("\n".join(rows))


if __name__ == "__main__":
    main()
