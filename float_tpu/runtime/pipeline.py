"""FloatPipeline — the InferenceAgent equivalent: jitted stage functions.

Three compiled stages (reference call stack: SURVEY §3.2):

    encode_image : (1, 3, S, S) [-1,1]  -> s_r, r_s_lambda, feats, r_s
    sample       : r_s + wa + we (+key) -> r_d motion latents
    decode       : s_r + feats + r_d    -> (T, S, S, 3) frames in [0,1]

plus the two audio encoders (content wa, emotion we).  Compilation is cached
per static shape key (T frames for audio, n_chunks for sampling, frame-chunk
count for decode); the "first run is warm-up" notion of the reference
(FLOAT.py:33) maps to XLA compile cache population.

Stateless by design: all parameters travel in a params dict; per-call
configuration is explicit (no reference-style opt mutation).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import (FloatConfig, Wav2Vec2Config, WAV2VEC2_BASE,
                      WAV2VEC2_LARGE_SER, EMOTION_LABELS)
from ..models.encoder import encode_image as _encode_image_fn
from ..models.synthesis import direction as _direction
from ..models.audio_encoder import encode_audio as _encode_audio_fn
from ..models.wav2vec2 import predict_emotion as _predict_emotion_fn
from .sampling import sample_motion_latents
from .decode import decode_latents


def audio_num_frames(n_samples: int, cfg: FloatConfig) -> int:
    """T = ceil(N * fps / sr) (reference: FLOAT.py:270)."""
    return math.ceil(n_samples * cfg.fps / cfg.sampling_rate)


def _stage_cb(progress, stage: str):
    """Adapt a ``progress(stage, i, n)`` callback to the decode loop's
    (i, n) frame_callback; None passes through (no overhead)."""
    if progress is None:
        return None
    return lambda i, n: progress(stage, i + 1, n)


def _report(progress, stage: str, i: int = 1, n: int = 1):
    if progress is not None:
        progress(stage, i, n)


def one_hot_emotion(label: str, dim_e: int = 7) -> jnp.ndarray:
    """(1, 1, E) one-hot for a named emotion (reference: FLOAT.py:200)."""
    idx = EMOTION_LABELS.index(label.lower())
    return jax.nn.one_hot(jnp.asarray([[idx]]), dim_e)


class SourceLatents(NamedTuple):
    """Pre-encoded source image: reusable across clips of the same
    speaker (the reference's separate image-encode node implies exactly
    this reuse, nodes_adv.py FloatImageEncode).  Produced by
    FloatPipeline.prepare_source; accepted by generate/generate_stream
    via ``source=`` — skips the ~617 M-param encoder forward per clip."""
    s_r: jnp.ndarray
    r_s_lambda: jnp.ndarray
    feats: list
    r_s: jnp.ndarray


class FloatPipeline:
    """End-to-end talking-portrait generation pipeline.

    params: {'encoder', 'synthesis', 'audio_encoder': {'wav2vec2',
    'audio_projection'}, 'emotion', 'fmt'} — the layout produced by
    io.checkpoint.load_unified_checkpoint or models.init.
    """

    def __init__(self, params, cfg: FloatConfig = FloatConfig(),
                 w2v_cfg: Wav2Vec2Config = WAV2VEC2_BASE,
                 ser_cfg: Wav2Vec2Config = WAV2VEC2_LARGE_SER,
                 mesh=None, aot_dir=None):
        """``mesh`` (jax.sharding.Mesh with axes ("data", "model")) enables
        the multi-chip mode: Megatron-style tensor parallelism for the
        wav2vec2 towers and the FMT (GSPMD from NamedShardings on the
        weights), and frame-parallel decode via a shard_map'd chunk
        (every frame independent — SURVEY §5.7/§5.8).  decode_batch must
        be divisible by the mesh size.

        ``aot_dir`` (or env FLOAT_AOT_CACHE) enables the cross-process
        AOT executable cache: compiled stage programs are serialized to
        disk and fresh processes load them with NO recompile
        (utils/aot_cache — kills the multi-minute cold start on
        transports where the XLA persistent cache cannot hit)."""
        import os as _os
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()
        aot_dir = aot_dir or _os.environ.get("FLOAT_AOT_CACHE")
        self._aot = None
        if aot_dir and mesh is None:
            from ..utils.aot_cache import AotCache
            self._aot = AotCache(aot_dir)
        self.cfg = cfg.validate()
        self.w2v_cfg = w2v_cfg
        self.ser_cfg = ser_cfg
        self.mesh = mesh
        if mesh is not None:
            if self.cfg.decode_batch % mesh.size:
                raise ValueError(
                    f"decode_batch {self.cfg.decode_batch} not divisible "
                    f"by mesh size {mesh.size}")
            from ..parallel.sharding import (
                fmt_param_shardings, wav2vec2_param_shardings,
                replicate_params, shard_pytree)
            sh = {
                "encoder": replicate_params(params["encoder"], mesh),
                "synthesis": replicate_params(params["synthesis"], mesh),
                "audio_encoder": {
                    "wav2vec2": wav2vec2_param_shardings(
                        params["audio_encoder"]["wav2vec2"], mesh),
                    "audio_projection": replicate_params(
                        params["audio_encoder"]["audio_projection"], mesh),
                },
                "emotion": wav2vec2_param_shardings(params["emotion"], mesh),
                "fmt": fmt_param_shardings(params["fmt"], mesh),
            }
            params = shard_pytree(params, sh)
        self.params = params
        self._build()

    def _build(self):
        cfg, w2v, ser = self.cfg, self.w2v_cfg, self.ser_cfg

        @jax.jit
        def _encode_image(enc_params, syn_params, img):
            s_r, lam, feats = _encode_image_fn(enc_params, img, cfg.input_size, cfg.dim_w)
            r_s = _direction(syn_params["direction"], lam)
            return s_r, lam, feats, r_s

        self._encode_image = _encode_image

        @partial(jax.jit, static_argnames=("seq_len",))
        def _encode_audio(ae_params, wave, seq_len):
            return _encode_audio_fn(ae_params, wave, seq_len, cfg, w2v)

        self._encode_audio = _encode_audio

        @jax.jit
        def _emotion(emo_params, wave):
            return _predict_emotion_fn(emo_params, wave, ser)

        self._emotion = _emotion

        # CFG scales are traced (changing them does NOT recompile); only the
        # structural cfg_mode / nfe / solver are static.
        sdt = jnp.dtype(cfg.sampler_dtype)

        @partial(jax.jit, static_argnames=("nfe", "method", "cfg_mode"))
        def _sample(fmt_params, r_s, wa, we, key, a_s, e_s, r_s_scale,
                    nfe, method, cfg_mode):
            # sampler_dtype: the dtype of wa drives every FMT matmul
            # (models/fmt casts weights to the activation dtype, f32
            # accumulate); r_d returns as f32 for the decode
            r_d = sample_motion_latents(
                fmt_params, r_s.astype(sdt), wa.astype(sdt),
                we.astype(sdt), cfg=cfg, key=key,
                a_cfg_scale=a_s, e_cfg_scale=e_s, r_cfg_scale=r_s_scale,
                nfe=nfe, ode_method=method, cfg_mode=cfg_mode)
            return r_d.astype(jnp.float32)

        self._sample = _sample

        # per-chunk sampler (same math as the scan body — sampling.
        # sample_motion_chunk) for the streaming mode: integrate chunk c+1
        # while chunk c decodes; also reused by generate_batch
        @partial(jax.jit, static_argnames=("nfe", "method", "cfg_mode"))
        def _sample_chunk(fmt_params, r_s, wa_t, we_t, carry, x0,
                          a_s, e_s, r_sc, nfe, method, cfg_mode):
            from .sampling import sample_motion_chunk
            out, new_carry = sample_motion_chunk(
                fmt_params, r_s.astype(sdt), wa_t.astype(sdt),
                we_t.astype(sdt), jax.tree.map(lambda a: a.astype(sdt), carry),
                x0.astype(sdt), cfg=cfg,
                a_cfg_scale=a_s, e_cfg_scale=e_s, r_cfg_scale=r_sc,
                nfe=nfe, ode_method=method, cfg_mode=cfg_mode)
            return out.astype(jnp.float32), new_carry

        self._sample_chunk = _sample_chunk

        # decode_latents manages its own per-chunk jit (python chunk loop);
        # under a mesh the chunk is shard_map'd over the frame batch
        chunk_fn = None
        if self.mesh is not None:
            from .decode import make_sharded_chunk_fn
            chunk_fn = make_sharded_chunk_fn(self.mesh)
        self._chunk_fn = chunk_fn

        if self._aot is not None:
            from .decode import _decode_chunk
            self._encode_image = self._aot.wrap("encode_image",
                                                _encode_image)
            self._encode_audio = self._aot.wrap("encode_audio",
                                                _encode_audio,
                                                ("seq_len",))
            self._emotion = self._aot.wrap("emotion", _emotion)
            self._sample = self._aot.wrap("sample", _sample,
                                          ("nfe", "method", "cfg_mode"))
            self._sample_chunk = self._aot.wrap(
                "sample_chunk", _sample_chunk,
                ("nfe", "method", "cfg_mode"))
            self._chunk_fn = self._aot.wrap(
                "decode_chunk", _decode_chunk,
                ("size", "out_u8", "channels_last", "blur_kernel",
                 "warp_disp", "with_stats", "fixup", "warp_path",
                 "use_warp_kernel", "probe"))
            # the AOT wrapper compiles per (shape, statics) key, so the
            # remainder-chunk bucket programs cache fine — keep the
            # measured bucketing win (decode._supports_buckets)
            self._chunk_fn.supports_buckets = True

        # pre-cast ONCE: the per-clip pytree cast was ~200 device
        # dispatches on every decode call (decode._cast_params skips
        # matching dtypes)
        self._syn_cast = jax.tree.map(
            lambda a: a.astype(jnp.dtype(cfg.compute_dtype)),
            self.params["synthesis"])

    def warmup(self, seconds: float = 2.0, first_chunk: int = 8) -> float:
        """Compile (or AOT-load) the headline programs BEFORE the first
        request: the full image encoder (the ~4-min compile on slow
        transports), audio/emotion encoders, the one-scan sampler and the
        per-chunk streaming sampler, and the decode chunk programs for
        both serving wires ("u8" raw and "yuv420" jpeg delivery).

        Returns the wall seconds spent.  With ``aot_dir`` set this both
        populates the cross-process cache on a cold machine and loads it
        with no compile on a warm one — `cli serve --warm` calls this
        before binding the port so the first real request never pays the
        compile stack (VERDICT r4 weak #6).  Audio-length-specific
        programs (encode_audio's seq_len, sampler chunk buckets) still
        compile per new bucket; the streaming per-chunk sampler warmed
        here covers ANY clip length."""
        import time as _time
        t0 = _time.perf_counter()
        cfg = self.cfg
        n = int(seconds * cfg.sampling_rate)
        # deterministic non-zero inputs (an all-zero wave is numerically
        # fine but a degenerate flow probe for the warp ratchet)
        key = jax.random.key(0)
        img = 0.1 * jax.random.normal(
            key, (1, 3, cfg.input_size, cfg.input_size), jnp.float32)
        wave = 0.05 * jax.random.normal(key, (1, n), jnp.float32)
        frames = self.generate(img, wave, emotion="none", seed=cfg.seed)
        float(jnp.sum(frames[0, 0, 0]))      # real sync on this transport
        for wire in ("u8", "yuv420"):
            for _s, _f in self.generate_stream(img, wave, emotion="none",
                                               seed=cfg.seed,
                                               first_chunk=first_chunk,
                                               wire=wire):
                pass
        return _time.perf_counter() - t0

    # ------------------------------------------------------------------
    # stage API (the Advanced-node surface maps onto these)
    # ------------------------------------------------------------------

    def encode_image(self, img: jnp.ndarray):
        """img (B, 3, S, S) in [-1, 1] -> (s_r, r_s_lambda, feats, r_s)."""
        return self._encode_image(self.params["encoder"],
                                  self.params["synthesis"], img)

    def prepare_source(self, img: jnp.ndarray) -> SourceLatents:
        """Encode a source image once for reuse across clips: pass the
        result as ``source=`` to generate/generate_stream and the
        per-clip encoder forward is skipped entirely."""
        return SourceLatents(*self.encode_image(img))

    def _resolve_source(self, img, source, progress):
        if source is not None:
            # no encoder forward ran — report the reuse as its own stage
            # so progress UIs don't display a phantom encode
            _report(progress, "reuse_source")
            return source
        if img is None:
            raise ValueError("provide img or source=")
        out = SourceLatents(*self.encode_image(img))
        _report(progress, "encode_image")
        return out

    def encode_audio(self, wave: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        """wave (B, N) normalized -> wa (B, seq_len, dim_w)."""
        return self._encode_audio(self.params["audio_encoder"], wave,
                                  seq_len=seq_len)

    def predict_emotion(self, wave: jnp.ndarray) -> jnp.ndarray:
        """wave (B, N) -> softmax scores (B, E).

        Clips beyond cfg.ser_max_sec are predicted over fixed windows and
        the scores averaged (weighted by window sample count): the
        wav2vec2-large attention is O(T²), so an unchunked 5-min clip
        would not fit; windows also bucket to at most two compiled
        program shapes (full window + one tail)."""
        cfg = self.cfg
        max_n = int(cfg.ser_max_sec * cfg.sampling_rate)
        n = wave.shape[-1]
        if n <= max_n:
            return self._emotion(self.params["emotion"], wave)
        scores = []
        weights = []
        for lo in range(0, n, max_n):
            w = wave[:, lo:lo + max_n]
            if w.shape[-1] < 1600:       # sub-0.1 s tail: fold into none
                break
            scores.append(self._emotion(self.params["emotion"], w))
            weights.append(w.shape[-1])
        tot = float(sum(weights))
        out = scores[0] * (weights[0] / tot)
        for s, wt in zip(scores[1:], weights[1:]):
            out = out + s * (wt / tot)
        return out

    def emotion_latent(self, wave: Optional[jnp.ndarray], emotion: str = "none"):
        """we (B, 1, E): predicted from audio or one-hot by label
        (reference: FLOAT.py:196-200)."""
        if emotion and emotion.lower() in EMOTION_LABELS:
            return one_hot_emotion(emotion, self.cfg.dim_e)
        if wave is None:
            raise ValueError("emotion='none' requires audio")
        return self.predict_emotion(wave)[:, None, :]

    def sample(self, r_s, wa, we, *, seed: Optional[int] = None,
               a_cfg_scale=None, e_cfg_scale=None, r_cfg_scale=None,
               nfe=None, ode_method=None) -> jnp.ndarray:
        """r_d (B, T, dim_w) via chunked CFG-ODE sampling.

        T is shape-bucketed before the jit boundary (sampling.bucket_
        n_chunks): padded chunks trail the real ones so the result is
        identical after the trim, and a new clip length reuses its
        bucket's compiled program instead of recompiling the scan.
        """
        from ..models.fmt import infer_cfg_mode
        from .sampling import bucket_n_chunks, pad_to_chunks
        cfg = self.cfg
        key = jax.random.key(cfg.seed if seed is None else seed)
        a_s = cfg.a_cfg_scale if a_cfg_scale is None else a_cfg_scale
        e_s = cfg.e_cfg_scale if e_cfg_scale is None else e_cfg_scale
        r_sc = cfg.r_cfg_scale if r_cfg_scale is None else r_cfg_scale
        mode = infer_cfg_mode(a_s, r_sc, e_s, cfg.include_r_cfg)

        t_true = wa.shape[1]
        clip = cfg.num_frames_for_clip
        nb = bucket_n_chunks(math.ceil(t_true / clip))
        wa_b = pad_to_chunks(wa, clip, nb)
        we_b = pad_to_chunks(we, clip, nb) if we.shape[1] > 1 else we
        r_d = self._sample(
            self.params["fmt"], r_s, wa_b, we_b, key,
            jnp.float32(a_s), jnp.float32(e_s), jnp.float32(r_sc),
            nfe=cfg.nfe if nfe is None else nfe,
            method=cfg.ode_method if ode_method is None else ode_method,
            cfg_mode=mode)
        return r_d[:, :t_true]

    def decode(self, s_r, feats, r_d, progress=None) -> jnp.ndarray:
        """(1, dim_w) + feats + (1|T, T, dim_w) -> (T, S, S, 3) in [0, 1].

        ``progress(stage, i, n)`` fires per decode chunk (dispatch-time:
        the result stays on device, nothing blocks here)."""
        if r_d.ndim == 3:
            r_d = r_d[0]
        return decode_latents(
            self._syn_cast, s_r, feats, r_d,
            size=self.cfg.input_size, decode_batch=self.cfg.decode_batch,
            compute_dtype=jnp.dtype(self.cfg.compute_dtype),
            chunk_fn=self._chunk_fn, use_warp_kernel=self.cfg.use_pallas,
            frame_callback=_stage_cb(progress, "decode"))

    def decode_to_host(self, s_r, feats, r_d, uint8_transfer: bool = True,
                       progress=None):
        """Decode + stream frames to host as float32 numpy (uint8 on the
        wire; chunk transfers overlap compute — use for long clips).

        ``progress(stage, i, n)`` fires as each chunk's bytes ARRIVE on
        the host (real completion, not dispatch)."""
        from .decode import decode_latents_to_host
        if r_d.ndim == 3:
            r_d = r_d[0]
        return decode_latents_to_host(
            self._syn_cast, s_r, feats, r_d,
            size=self.cfg.input_size, decode_batch=self.cfg.decode_batch,
            compute_dtype=jnp.dtype(self.cfg.compute_dtype),
            uint8_transfer=uint8_transfer, chunk_fn=self._chunk_fn,
            use_warp_kernel=self.cfg.use_pallas,
            frame_callback=_stage_cb(progress, "decode"))

    # ------------------------------------------------------------------
    # one-shot generation (the FloatProcess node equivalent)
    # ------------------------------------------------------------------

    def generate(self, img: Optional[jnp.ndarray], wave: jnp.ndarray, *,
                 emotion: str = "none", seed: Optional[int] = None,
                 a_cfg_scale=None, e_cfg_scale=None, r_cfg_scale=None,
                 nfe=None, ode_method=None, progress=None,
                 source: Optional[SourceLatents] = None,
                 fps: Optional[float] = None) -> jnp.ndarray:
        """Full pipeline: (1,3,S,S) image + (1,N) audio -> (T,S,S,3) frames.

        Mirrors FLOAT.inference (reference: FLOAT.py:255-298).
        ``progress(stage, i, n)`` reports the encode/audio/emotion/sample
        stages at dispatch and the decode per chunk.  ``source=`` (from
        prepare_source) reuses a pre-encoded image; ``img`` may then be
        None.  The full clip stays device-resident (f32: T·S²·3·4 bytes —
        ~1 GB per 320 frames at 512²); for long clips use
        ``generate_stream``/``decode_to_host`` instead, which bound
        memory at one decode chunk (a 60 s / 1500-frame clip OOMs the
        16 GB chip through this method, PERF.md r4).  ``fps`` overrides the output frame rate for THIS clip
        (frame count + audio-feature grid, like float_process's fps
        argument); the sampler's chunk span stays on the pipeline config,
        exactly like the reference, whose FLOAT.num_frames_for_clip is
        fixed at construction (FLOAT.py:36) while the adv nodes' fps
        override only re-lays the audio grid (nodes_adv.py:455,463).
        """
        t_frames = audio_num_frames(
            wave.shape[-1],
            self.cfg if fps is None else self.cfg.replace(fps=fps))
        s_r, _lam, feats, r_s = self._resolve_source(img, source, progress)
        wa = self.encode_audio(wave, t_frames)
        _report(progress, "encode_audio")
        we = self.emotion_latent(wave, emotion)
        _report(progress, "emotion")
        r_d = self.sample(r_s, wa, we, seed=seed,
                          a_cfg_scale=a_cfg_scale, e_cfg_scale=e_cfg_scale,
                          r_cfg_scale=r_cfg_scale, nfe=nfe, ode_method=ode_method)
        _report(progress, "sample")
        return self.decode(s_r, feats, r_d, progress=progress)

    def generate_stream(self, img: Optional[jnp.ndarray], wave: jnp.ndarray,
                        *, emotion: str = "none", seed: Optional[int] = None,
                        a_cfg_scale=None, e_cfg_scale=None, r_cfg_scale=None,
                        nfe=None, ode_method=None,
                        uint8_transfer: bool = True, progress=None,
                        source: Optional[SourceLatents] = None,
                        fps: Optional[float] = None,
                        first_chunk: int = 0, wire: str = "f32"):
        """Streaming generation: yields (start_frame, frames (k, S, S, 3)
        float32 numpy in [0,1]) as soon as each decode chunk reaches the
        host, instead of returning the whole clip at the end.

        ``wire`` selects the yielded format (and the device->host wire):
        "f32" (default), "u8" (uint8 RGB, no host /255 round-trip), or
        "yuv420" (planar 4:2:0 uint8 (k, S*3//2, S) — half the u8 wire
        bytes; decode with ops.yuv420.i420_to_rgb_u8).  Serving uses
        "u8"/"yuv420": the NDJSON/JPEG encoders want uint8 anyway.

        ``first_chunk`` > 0 decodes the FIRST chunk at that frame count
        (rounded to the 4-frame bucket) instead of a full decode_batch:
        first frames arrive after a fraction of a chunk's compute + wire;
        later chunks are full-size so throughput is unchanged.

        The sampler runs chunk-by-chunk (sampling.sample_motion_chunk —
        same math and noise as the one-scan ``sample``) interleaved with
        decode dispatch, so the device decodes chunk c while integrating
        chunk c+1 and first frames arrive after ~one sampler chunk + one
        decode chunk rather than after full sampling + full decode
        (the streamed per-frame decode intent of reference FLOAT.py:113-169).
        A bonus on slow-compile transports: the per-chunk sampler program
        compiles ONCE for any clip length (no shape buckets).
        """
        from ..models.fmt import infer_cfg_mode
        from .sampling import (sampler_init_carry, chunk_noise,
                               pad_to_chunks)
        from .decode import decode_latents_stream

        cfg = self.cfg
        t_frames = audio_num_frames(
            wave.shape[-1], cfg if fps is None else cfg.replace(fps=fps))
        s_r, _lam, feats, r_s = self._resolve_source(img, source, progress)
        wa = self.encode_audio(wave, t_frames)
        _report(progress, "encode_audio")
        we = self.emotion_latent(wave, emotion)
        _report(progress, "emotion")

        key = jax.random.key(cfg.seed if seed is None else seed)
        a_s = cfg.a_cfg_scale if a_cfg_scale is None else a_cfg_scale
        e_s = cfg.e_cfg_scale if e_cfg_scale is None else e_cfg_scale
        r_sc = cfg.r_cfg_scale if r_cfg_scale is None else r_cfg_scale
        mode = infer_cfg_mode(a_s, r_sc, e_s, cfg.include_r_cfg)
        nfe_ = cfg.nfe if nfe is None else nfe
        method = cfg.ode_method if ode_method is None else ode_method

        clip = cfg.num_frames_for_clip
        n_chunks = math.ceil(t_frames / clip)
        b = wa.shape[0]
        wa_p = pad_to_chunks(wa, clip)
        dynamic = we.shape[1] > 1
        we_p = pad_to_chunks(we, clip) if dynamic else we

        def latent_chunks():
            # carry in the SAMPLER dtype: _sample_chunk returns its carry in
            # cfg.sampler_dtype, so an f32 init would give chunk 0 different
            # carry avals than chunk 1+ — a second full FMT-sampler compile
            # under sampler_dtype='bfloat16'
            carry = sampler_init_carry(b, cfg, jnp.dtype(cfg.sampler_dtype))
            done = 0
            for c in range(n_chunks):
                x0 = chunk_noise(key, c, b, cfg, wa.dtype)
                wa_t = jax.lax.dynamic_slice_in_dim(wa_p, c * clip, clip, 1)
                we_t = (jax.lax.dynamic_slice_in_dim(we_p, c * clip, clip, 1)
                        if dynamic else we)
                sample_t, carry = self._sample_chunk(
                    self.params["fmt"], r_s, wa_t, we_t, carry, x0,
                    jnp.float32(a_s), jnp.float32(e_s), jnp.float32(r_sc),
                    nfe=nfe_, method=method, cfg_mode=mode)
                take = min(clip, t_frames - done)
                done += take
                _report(progress, "sample", c + 1, n_chunks)
                yield sample_t[0, :take]

        n_dchunks = math.ceil(t_frames / cfg.decode_batch)
        cb = None
        if progress is not None:
            cb = lambda i, n: progress("decode", i + 1, n_dchunks)  # noqa: E731
        yield from decode_latents_stream(
            self._syn_cast, s_r, feats, latent_chunks(),
            size=cfg.input_size, decode_batch=cfg.decode_batch,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            uint8_transfer=uint8_transfer, chunk_fn=self._chunk_fn,
            use_warp_kernel=cfg.use_pallas, frame_callback=cb,
            first_chunk=first_chunk, emit=wire)

    def generate_batch(self, imgs: jnp.ndarray, waves, *,
                       emotion: str = "none", seeds=None,
                       a_cfg_scale=None, e_cfg_scale=None, r_cfg_scale=None,
                       nfe=None, ode_method=None, progress=None):
        """B clips, data-parallel: ONE batched encode/sample pass over the
        clip batch (under a mesh the batch shards over the ``data`` axis
        via GSPMD), then all clips' decode chunks share one optimistic
        dispatch stream with a single post-loop sync
        (runtime.decode.decode_clips_to_host).

        imgs (B, 3, S, S); waves (B, N) equal-length, OR a list of B 1-D
        arrays of DIFFERING lengths (ragged batch).  Ragged clips are NOT
        zero-padded to a shared length — padding would change the
        wav2vec2 attention (global within a clip) and so the features of
        the real frames; instead audio encodes batch per length group and
        every clip's decode chunks share the single dispatch stream, so a
        mixed-length batch pays one decode pass, not one per length, with
        outputs identical to serial generate calls.  Under a mesh, ragged
        batches still ride the ``data`` axis: the image encode shards
        over the full clip batch and each audio length group shards when
        its size divides the axis (a non-dividing group runs replicated
        — correct, just not parallel).  ``seeds``: per-clip
        noise seeds (list of B ints; default cfg.seed + i, matching the
        reference's per-item seed+i, nodes.py:189-211).  Returns a list
        of B (T_i, S, S, 3) float32 arrays.

        Replaces the reference's serial pair loop
        (reference: src/nodes/nodes.py:189-211) — the reference had no
        alternative on one GPU; a frame-batched TPU decode does not care
        which clip a chunk came from.
        """
        from .decode import decode_clips_to_host

        cfg = self.cfg
        bsz = imgs.shape[0]
        ragged = isinstance(waves, (list, tuple))
        if ragged:
            waves = [jnp.asarray(w).reshape(-1) for w in waves]
            assert len(waves) == bsz, (imgs.shape, len(waves))
            if len({int(w.shape[-1]) for w in waves}) == 1:
                waves, ragged = jnp.stack(waves), False
        else:
            assert waves.shape[0] == bsz, (imgs.shape, waves.shape)
        if seeds is None:
            seeds = [cfg.seed + i for i in range(bsz)]

        data_sh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_sh = NamedSharding(self.mesh, P("data"))
            data_n = self.mesh.shape.get("data", 1)
            # the image encode is length-independent: shard the clip batch
            # over the data axis whenever it divides, ragged or not
            if bsz % data_n == 0:
                imgs = jax.device_put(imgs, data_sh)
            if not ragged and bsz % data_n == 0:
                waves = jax.device_put(waves, data_sh)

        s_r, _lam, feats, r_s = self.encode_image(imgs)
        _report(progress, "encode_image")

        if ragged:
            # audio stages batch per length GROUP (identical math to the
            # per-clip path: every op is batch-independent), scattered
            # back to request order; under a mesh each group rides the
            # data axis when its size divides it (VERDICT r4 weak #3 —
            # ragged batches must not silently fall off the mesh)
            groups: dict = {}
            for i, w in enumerate(waves):
                groups.setdefault(int(w.shape[-1]), []).append(i)
            wa_i = [None] * bsz
            we_i = [None] * bsz
            for n, idxs in sorted(groups.items()):
                wv = jnp.stack([waves[i] for i in idxs])
                if data_sh is not None and len(idxs) % data_n == 0:
                    wv = jax.device_put(wv, data_sh)
                wa_g = self.encode_audio(wv, audio_num_frames(n, cfg))
                we_g = self.emotion_latent(wv, emotion)
                if we_g.shape[0] == 1 and len(idxs) > 1:
                    we_g = jnp.broadcast_to(
                        we_g, (len(idxs),) + we_g.shape[1:])
                for k, i in enumerate(idxs):
                    wa_i[i] = wa_g[k:k + 1]
                    we_i[i] = we_g[k:k + 1]
        else:
            t_frames = audio_num_frames(waves.shape[-1], cfg)
            wa = self.encode_audio(waves, t_frames)
            we = self.emotion_latent(waves, emotion)
            if we.shape[0] == 1 and bsz > 1:   # named-emotion one-hot is B=1
                we = jnp.broadcast_to(we, (bsz,) + we.shape[1:])
            wa_i = [wa[i:i + 1] for i in range(bsz)]
            we_i = [we[i:i + 1] for i in range(bsz)]
        _report(progress, "encode_audio")
        _report(progress, "emotion")

        # per-clip noise seeds -> per-clip sampling (the per-chunk fold_in
        # keys differ per clip, so the batch can't share one key); chunks
        # of ALL clips still dispatch back-to-back (async) before decode.
        r_ds = []
        for i in range(bsz):
            r_d = self.sample(r_s[i:i + 1], wa_i[i],
                              we_i[i], seed=seeds[i],
                              a_cfg_scale=a_cfg_scale,
                              e_cfg_scale=e_cfg_scale,
                              r_cfg_scale=r_cfg_scale,
                              nfe=nfe, ode_method=ode_method)
            r_ds.append(r_d[0])
        _report(progress, "sample")

        clips = [(s_r[i:i + 1], [f[i:i + 1] for f in feats], r_ds[i])
                 for i in range(bsz)]
        return decode_clips_to_host(
            self._syn_cast, clips,
            size=cfg.input_size, decode_batch=cfg.decode_batch,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            chunk_fn=self._chunk_fn, use_warp_kernel=cfg.use_pallas,
            frame_callback=_stage_cb(progress, "decode"))


def build_synthetic_pipeline(cfg: FloatConfig = FloatConfig(),
                             w2v_cfg: Wav2Vec2Config = WAV2VEC2_BASE,
                             ser_cfg: Wav2Vec2Config = WAV2VEC2_LARGE_SER,
                             seed: int = 0, aot_dir=None) -> FloatPipeline:
    """Pipeline with randomly initialized weights (tests / benchmarks)."""
    from ..models import init as minit
    params = {
        "encoder": minit.init_encoder(cfg.input_size, cfg.dim_w, cfg.dim_m, seed),
        "synthesis": minit.init_synthesis(cfg.input_size, cfg.dim_w, cfg.dim_m, seed + 1),
        "audio_encoder": {
            "wav2vec2": minit.init_wav2vec2(w2v_cfg, seed + 2),
            "audio_projection": minit.init_audio_projection(
                (w2v_cfg.hidden_size if cfg.only_last_features
                 else w2v_cfg.num_hidden_layers * w2v_cfg.hidden_size),
                cfg.dim_w, seed + 3),
        },
        "emotion": minit.init_wav2vec2(ser_cfg, seed + 4),
        "fmt": minit.init_fmt(cfg, seed + 5),
    }
    return FloatPipeline(params, cfg, w2v_cfg, ser_cfg, aot_dir=aot_dir)
