"""HTTP serving daemon — production deployment surface for one chip.

The reference deploys as a ComfyUI server; this framework's equivalent is
a dependency-free (stdlib http.server) daemon over the same pipeline:

    python -m float_tpu.cli serve --checkpoint models/float/FLOAT.safetensors \
        --host 0.0.0.0 --port 8472

Endpoints (JSON in, JSON or binary out):

- ``GET  /health`` -> {"status", "device", "weights", "busy"}
- ``GET  /metrics`` -> cumulative {"requests", "errors", "frames",
  "busy_seconds", "frames_per_busy_second"}
- ``POST /v1/generate`` body
  {"image": <b64 npy|png|jpg>, "audio": <b64 npy|wav>, "emotion",
   "a_cfg_scale", "e_cfg_scale", "fps", "seed", "face_align",
   "stream": false, "format": "mp4"|"ndjson"}
  -> video/mp4 bytes (audio muxed when ffmpeg is present), or with
  ``stream: true`` an ``application/x-ndjson`` response where each line is
  {"start": f, "shape": [k,S,S,3], "dtype": "uint8", "data": <b64>} —
  chunks leave the server as soon as the device decodes them (the
  pipeline's generate_stream interleaves sampling and decode).
- ``POST /v1/generate_batch`` body {"clips": [{"image", "audio",
  "seed"?}, ...], ...shared params} -> {"clips": [{"video": <b64 mp4>,
  "frames"}, ...]} — clips grouped by audio length; each group runs the
  data-parallel generate_batch path (one batched encode/sample, one
  decode dispatch stream; shards over the mesh ``data`` axis when the
  pipeline was built with one).
- ``POST /v1/graph`` body {"workflow": <ComfyUI graph JSON>,
  "overrides": {...}, "inputs": {"name.ext": <b64>}} -> {"artifacts":
  {name: <b64>}} — executes a reference ComfyUI workflow server-side
  (api/comfy.py registry).

One generation runs at a time (single-chip serialization via a mutex);
concurrent requests queue on the lock, health checks never block.
"""
from __future__ import annotations

import base64
import io
import json
import logging
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger("float_tpu.serve")


def _b64_to_array(data: str, kind: str) -> np.ndarray:
    """base64 payload -> numpy array.  .npy magic is auto-detected; wav
    via the shared PCM reader; images via cv2."""
    raw = base64.b64decode(data)
    if raw[:6] == b"\x93NUMPY":
        return np.load(io.BytesIO(raw), allow_pickle=False)
    suffix = ".wav" if kind == "audio" else ".png"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(raw)
        path = f.name
    try:
        if kind == "audio":
            from .audio.resample import read_wav_file, resample, to_mono
            arr, sr = read_wav_file(path)
            return resample(to_mono(arr), sr, 16000)
        from .cli import load_image_file
        return load_image_file(path)
    finally:
        os.unlink(path)


class FloatServer:
    """Wraps a FloatPipe behind the HTTP handler; testable without
    sockets via ``handle_generate`` / ``handle_graph``."""

    def __init__(self, pipe, output_dir: Optional[str] = None):
        self.pipe = pipe
        self.output_dir = output_dir or tempfile.mkdtemp(prefix="float_srv_")
        self.lock = threading.Lock()     # one generation at a time per chip
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "errors": 0, "frames": 0,
                      "busy_seconds": 0.0}

    def _count(self, frames: int = 0, busy: float = 0.0, error: bool = False):
        with self._stats_lock:
            self.stats["requests"] += 1
            self.stats["errors"] += 1 if error else 0
            self.stats["frames"] += frames
            self.stats["busy_seconds"] += busy

    # -- request handlers (transport-independent) --------------------------

    def health(self) -> Dict[str, Any]:
        import jax
        return {"status": "ok",
                "device": str(jax.devices()[0]),
                "weights": self.pipe.weights,
                "busy": self.lock.locked()}

    def metrics(self) -> Dict[str, Any]:
        """Serving counters: cumulative requests / errors / generated
        frames / device-busy seconds, and derived frames-per-busy-second
        (the serving-side view of the bench.py metric)."""
        with self._stats_lock:
            out = dict(self.stats)
        busy = out["busy_seconds"]
        out["frames_per_busy_second"] = \
            round(out["frames"] / busy, 2) if busy > 0 else None
        return out

    def handle_generate(self, req: Dict[str, Any]):
        """Non-streaming generate -> (mp4 bytes, n_frames)."""
        import time
        img = _b64_to_array(req["image"], "image")
        wave = _b64_to_array(req["audio"], "audio").astype(np.float32)
        from .api.nodes import float_process
        from .io.video import write_video
        with self.lock:
            t0 = time.perf_counter()
            frames, _audio, fps = float_process(
                img[None] if img.ndim == 3 else img,
                wave[None] if wave.ndim == 1 else wave, self.pipe,
                a_cfg_scale=float(req.get("a_cfg_scale", 2.0)),
                e_cfg_scale=float(req.get("e_cfg_scale", 1.0)),
                fps=float(req.get("fps", 25.0)),
                emotion=req.get("emotion", "none"),
                face_align=bool(req.get("face_align", False)),
                seed=int(req.get("seed", 15)))
            self._count(frames=frames.shape[0],
                        busy=time.perf_counter() - t0)
        path = os.path.join(self.output_dir, "gen.mp4")
        write_video(path, frames, fps, audio=wave.reshape(-1),
                    sample_rate=16000)
        with open(path, "rb") as f:
            return f.read(), frames.shape[0]

    def iter_generate_stream(self, req: Dict[str, Any]):
        """Streaming generate -> yields NDJSON lines (bytes)."""
        import jax.numpy as jnp
        from .api.nodes import comfy_image_to_model_input, normalize_waveform
        img = _b64_to_array(req["image"], "image")
        wave = _b64_to_array(req["audio"], "audio").astype(np.float32)
        cfg = self.pipe.cfg.replace(fps=float(req.get("fps", 25.0)))
        model_in, _ = comfy_image_to_model_input(
            img, cfg.input_size, cfg.rgba_conversion, cfg.bkg_color_hex,
            face_align=bool(req.get("face_align", False)),
            face_margin=cfg.face_margin)
        wave_n = jnp.asarray(normalize_waveform(wave.reshape(-1),
                                                self.pipe.fe)[None])
        import time
        n_frames, t0 = 0, time.perf_counter()
        with self.lock:
            for start, frames in self.pipe.pipeline.generate_stream(
                    jnp.asarray(model_in), wave_n,
                    emotion=req.get("emotion", "none"),
                    seed=int(req.get("seed", 15)),
                    a_cfg_scale=float(req.get("a_cfg_scale", 2.0)),
                    e_cfg_scale=float(req.get("e_cfg_scale", 1.0)),
                    fps=cfg.fps):
                n_frames += frames.shape[0]
                u8 = np.clip(np.asarray(frames) * 255.0 + 0.5,
                             0, 255).astype(np.uint8)
                yield (json.dumps(
                    {"start": int(start), "shape": list(u8.shape),
                     "dtype": "uint8",
                     "data": base64.b64encode(u8.tobytes()).decode()})
                    + "\n").encode()
        self._count(frames=n_frames, busy=time.perf_counter() - t0)

    def handle_generate_batch(self, req: Dict[str, Any]) -> Dict[str, Any]:
        """Batched clips: {"clips": [{"image", "audio", "seed"?}, ...]}
        plus shared params.  Clips are grouped by audio length; each
        group runs the data-parallel generate_batch path (one batched
        encode/sample + one decode dispatch stream; under a mesh the
        batch shards over the ``data`` axis).  Returns per-clip mp4s in
        request order."""
        import time
        import jax.numpy as jnp
        from .api.nodes import comfy_image_to_model_input, normalize_waveform
        from .io.video import write_video
        clips = req["clips"]
        if not clips:
            raise ValueError("clips must be a non-empty list")
        cfg = self.pipe.cfg.replace(fps=float(req.get("fps", 25.0)))
        prepped = []
        for i, c in enumerate(clips):
            img = _b64_to_array(c["image"], "image")
            wave = _b64_to_array(c["audio"], "audio").astype(np.float32)
            wave = wave.reshape(-1)
            model_in, _ = comfy_image_to_model_input(
                img, cfg.input_size, cfg.rgba_conversion, cfg.bkg_color_hex,
                face_align=bool(req.get("face_align", False)),
                face_margin=cfg.face_margin)
            seed = int(c.get("seed", int(req.get("seed", cfg.seed)) + i))
            prepped.append((i, model_in[0], wave, seed))

        results: Dict[int, Dict[str, Any]] = {}
        groups: Dict[int, list] = {}
        for item in prepped:
            groups.setdefault(len(item[2]), []).append(item)
        with self.lock:
            t0 = time.perf_counter()
            for _n, group in sorted(groups.items()):
                imgs = jnp.asarray(np.stack([g[1] for g in group]))
                waves = jnp.asarray(np.stack(
                    [normalize_waveform(g[2], self.pipe.fe) for g in group]))
                outs = self.pipe.pipeline.generate_batch(
                    imgs, waves, emotion=req.get("emotion", "none"),
                    seeds=[g[3] for g in group],
                    a_cfg_scale=float(req.get("a_cfg_scale", 2.0)),
                    e_cfg_scale=float(req.get("e_cfg_scale", 1.0)))
                for (idx, _im, wave, _s), frames in zip(group, outs):
                    path = os.path.join(self.output_dir, f"clip{idx}.mp4")
                    write_video(path, frames, cfg.fps, audio=wave,
                                sample_rate=16000)
                    with open(path, "rb") as f:
                        results[idx] = {
                            "video": base64.b64encode(f.read()).decode(),
                            "frames": int(frames.shape[0])}
            self._count(frames=sum(r["frames"] for r in results.values()),
                        busy=time.perf_counter() - t0)
        return {"clips": [results[i] for i in range(len(clips))]}

    def handle_graph(self, req: Dict[str, Any]) -> Dict[str, Any]:
        """Execute a ComfyUI workflow graph; returns artifacts as base64."""
        from .api.comfy import GraphContext, run_comfy_workflow
        with tempfile.TemporaryDirectory(prefix="float_graph_") as tmp:
            inputs_dir = os.path.join(tmp, "in")
            out_dir = os.path.join(tmp, "out")
            os.makedirs(inputs_dir)
            for name, b64 in (req.get("inputs") or {}).items():
                safe = os.path.basename(name)
                with open(os.path.join(inputs_dir, safe), "wb") as f:
                    f.write(base64.b64decode(b64))
            ctx = GraphContext(
                models_root=req.get("models_root", "models"),
                inputs_dir=inputs_dir, output_dir=out_dir,
                overrides=req.get("overrides") or {},
                float_pipe=self.pipe,
                allow_synthetic=bool(req.get("allow_synthetic", False)))
            with self.lock:
                _results, ctx = run_comfy_workflow(req["workflow"], ctx)
            artifacts = {}
            for path in ctx.artifacts:
                with open(path, "rb") as f:
                    artifacts[os.path.relpath(path, out_dir)] = \
                        base64.b64encode(f.read()).decode()
            return {"artifacts": artifacts}


class _BodyTooLarge(Exception):
    pass


class _Handler(BaseHTTPRequestHandler):
    server_version = "float_tpu"
    protocol_version = "HTTP/1.1"    # chunked streaming needs 1.1
    srv: FloatServer = None          # set by make_server

    def log_message(self, fmt, *args):
        logger.info("%s %s", self.address_string(), fmt % args)

    def _json(self, code: int, obj: Dict[str, Any]):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            return self._json(200, self.srv.health())
        if self.path == "/metrics":
            return self._json(200, self.srv.metrics())
        self._json(404, {"error": f"unknown path {self.path}"})

    # request bodies carry base64 media; bound them so a stray client
    # cannot OOM the server (override via FLOAT_SERVE_MAX_BODY_MB)
    MAX_BODY = int(os.environ.get("FLOAT_SERVE_MAX_BODY_MB", "512")) << 20

    def _read_body(self) -> Dict[str, Any]:
        n = int(self.headers.get("Content-Length", 0))
        if n > self.MAX_BODY:
            raise _BodyTooLarge(n)
        return json.loads(self.rfile.read(n) or b"{}")

    def do_POST(self):
        try:
            req = self._read_body()
            if self.path == "/v1/generate":
                if req.get("stream"):
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for line in self.srv.iter_generate_stream(req):
                        self.wfile.write(
                            f"{len(line):x}\r\n".encode() + line + b"\r\n")
                    self.wfile.write(b"0\r\n\r\n")
                    return
                video, n_frames = self.srv.handle_generate(req)
                self.send_response(200)
                self.send_header("Content-Type", "video/mp4")
                self.send_header("Content-Length", str(len(video)))
                self.send_header("X-Frames", str(n_frames))
                self.end_headers()
                self.wfile.write(video)
                return
            if self.path == "/v1/generate_batch":
                return self._json(200, self.srv.handle_generate_batch(req))
            if self.path == "/v1/graph":
                return self._json(200, self.srv.handle_graph(req))
            self._json(404, {"error": f"unknown path {self.path}"})
        except _BodyTooLarge as exc:
            self.close_connection = True    # unread body would desync 1.1
            self._json(413, {"error": f"body of {exc.args[0]} bytes "
                                      f"exceeds limit {self.MAX_BODY}"})
        except (KeyError, ValueError, json.JSONDecodeError) as exc:
            self._json(400, {"error": str(exc)})
        except BrokenPipeError:
            raise
        except Exception as exc:
            logger.exception("request failed")
            self.srv._count(error=True)
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})


def make_server(pipe, host: str = "127.0.0.1", port: int = 8472,
                output_dir: Optional[str] = None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server around a loaded FloatPipe;
    port 0 picks a free port (tests)."""
    srv = FloatServer(pipe, output_dir=output_dir)
    handler = type("BoundHandler", (_Handler,), {"srv": srv})
    return ThreadingHTTPServer((host, port), handler)


def serve(checkpoint: str, host: str = "127.0.0.1", port: int = 8472,
          allow_synthetic: bool = False, models_root: str = "models",
          advanced_float_options: Optional[dict] = None,
          mesh_spec: Optional[str] = None):
    """Load the pipeline, warm nothing (first request compiles), serve
    forever.  The reference equivalent is running ComfyUI as a server.

    ``mesh_spec`` ("data=2,model=4", either axis optional) builds the
    pipeline over a device mesh: generate_batch shards clips over the
    ``data`` axis, the FMT/wav2vec2 towers run Megatron-TP over
    ``model``, decode runs frame-parallel (parallel/mesh.py)."""
    from .api.nodes import load_float_models
    pipe = load_float_models(checkpoint, models_root=models_root,
                             advanced_float_options=advanced_float_options,
                             allow_synthetic=allow_synthetic)
    if mesh_spec:
        from .parallel.mesh import make_mesh
        from .runtime.pipeline import FloatPipeline
        axes = dict(kv.split("=") for kv in mesh_spec.split(","))
        mesh = make_mesh(data=int(axes["data"]) if "data" in axes else None,
                         model=int(axes["model"]) if "model" in axes else None)
        pl = pipe.pipeline
        pipe.pipeline = FloatPipeline(pl.params, pl.cfg, pl.w2v_cfg,
                                      pl.ser_cfg, mesh=mesh)
        logger.info("mesh mode: %s", dict(mesh.shape))
    httpd = make_server(pipe, host, port)
    logger.info("serving on http://%s:%d (weights=%s)", host,
                httpd.server_address[1], pipe.weights)
    print(f"float_tpu serving on http://{host}:{httpd.server_address[1]}")
    httpd.serve_forever()
