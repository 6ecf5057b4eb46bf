"""Round-3 serving surface: streaming generation, batched clip decode,
progress plumbing, video output.  Tiny synthetic config, CPU-runnable."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from float_tpu.config import FloatConfig
from float_tpu.runtime.pipeline import build_synthetic_pipeline, audio_num_frames

from test_pipeline import TINY, TINY_W2V, TINY_SER


@pytest.fixture(scope="module")
def pipe():
    return build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    return img, wave


# ---------------------------------------------------------------------------
# streaming generation
# ---------------------------------------------------------------------------

def test_generate_stream_matches_generate(pipe, inputs):
    """Streamed chunks concatenate to EXACTLY the one-shot clip (same noise
    via the shared (key, chunk) fold_in; same chunk math)."""
    img, wave = inputs
    ref = np.asarray(pipe.generate(img, wave, emotion="happy", seed=3))

    starts, parts = [], []
    for start, frames in pipe.generate_stream(img, wave, emotion="happy",
                                              seed=3, uint8_transfer=False):
        starts.append(start)
        parts.append(frames)
    got = np.concatenate(parts, axis=0)
    assert starts == sorted(starts)
    assert starts[0] == 0
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_generate_stream_first_chunk_ramp(pipe, inputs):
    """first_chunk ramps the FIRST decode dispatch small (low first-frame
    latency); output is EXACTLY the one-shot clip and later chunks are
    full decode_batch."""
    img, wave = inputs
    ref = np.asarray(pipe.generate(img, wave, emotion="happy", seed=3))

    starts, parts = [], []
    for start, frames in pipe.generate_stream(img, wave, emotion="happy",
                                              seed=3, uint8_transfer=False,
                                              first_chunk=3):
        starts.append(start)
        parts.append(frames)
    # 3 rounds up to the 4-frame bucket; later chunks are decode_batch (4)
    assert parts[0].shape[0] == 4
    assert starts[0] == 0 and starts[1] == 4
    got = np.concatenate(parts, axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)
    # a first_chunk larger than decode_batch clamps to decode_batch
    parts = [f for _s, f in pipe.generate_stream(
        img, wave, emotion="happy", seed=3, uint8_transfer=False,
        first_chunk=99)]
    np.testing.assert_allclose(np.concatenate(parts, axis=0), ref,
                               atol=2e-5, rtol=0)


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def test_chunk_sampler_matches_scan_dynamic_emotion(pipe, inputs):
    """The per-chunk sampler (streaming mode) reproduces the one-scan
    sampler exactly — including dynamic (B, T, E) emotion with its
    prev_we carry."""
    import math
    import jax
    from float_tpu.runtime.sampling import (
        sample_motion_latents, sample_motion_chunk, sampler_init_carry,
        chunk_noise, pad_to_chunks)

    img, wave = inputs
    t = audio_num_frames(16000, TINY)
    rng = np.random.default_rng(11)
    we = jnp.asarray(_softmax(rng.standard_normal((1, t, 7))))
    s_r, _lam, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)

    cfg = TINY
    key = jax.random.key(5)
    clip = cfg.num_frames_for_clip
    n_chunks = math.ceil(t / clip)
    ref_rd = sample_motion_latents(pipe.params["fmt"], r_s, wa, we,
                                   cfg=cfg, key=key, cfg_mode="3way")
    wa_p = pad_to_chunks(wa, clip)
    we_p = pad_to_chunks(we, clip)
    carry = sampler_init_carry(1, cfg, wa.dtype)
    outs = []
    for c in range(n_chunks):
        x0 = chunk_noise(key, c, 1, cfg, wa.dtype)
        sample_t, carry = sample_motion_chunk(
            pipe.params["fmt"], r_s, wa_p[:, c * clip:(c + 1) * clip],
            we_p[:, c * clip:(c + 1) * clip], carry, x0, cfg=cfg,
            a_cfg_scale=cfg.a_cfg_scale, e_cfg_scale=cfg.e_cfg_scale,
            r_cfg_scale=cfg.r_cfg_scale, nfe=cfg.nfe,
            ode_method=cfg.ode_method, cfg_mode="3way")
        outs.append(sample_t)
    got_rd = jnp.concatenate(outs, axis=1)[:, :t]
    np.testing.assert_allclose(np.asarray(got_rd), np.asarray(ref_rd),
                               atol=1e-5, rtol=0)


def test_generate_stream_first_chunk_before_full_sampling(pipe, inputs):
    """The first decoded chunk must be yielded before the LAST sampler
    chunk is integrated (the interleaving contract)."""
    img, wave = inputs
    order = []

    def progress(stage, i, n):
        order.append((stage, i, n))

    gen = pipe.generate_stream(img, wave, emotion="happy", seed=3,
                               progress=progress)
    next(gen)
    stages = [s for s, _i, _n in order]
    # at least one sample-chunk report exists, and the generator yielded
    # while sampling may still be in flight
    assert "sample" in stages
    list(gen)   # drain
    n_sample = max(i for s, i, _n in order if s == "sample")
    n_decode = max(i for s, i, _n in order if s == "decode")
    assert n_sample >= 1 and n_decode >= 1


# ---------------------------------------------------------------------------
# batched clip serving
# ---------------------------------------------------------------------------

def test_decode_clips_matches_per_clip(pipe, inputs):
    from float_tpu.runtime.decode import (decode_clips_to_host,
                                          decode_latents_to_host)
    img, wave = inputs
    t = audio_num_frames(16000, TINY)
    s_r, _lam, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)
    we = pipe.emotion_latent(wave, "happy")
    r_d_a = pipe.sample(r_s, wa, we, seed=1)[0]
    r_d_b = pipe.sample(r_s, wa, we, seed=2)[0, : t - 3]   # ragged length

    clips = [(s_r, feats, r_d_a), (s_r, feats, r_d_b)]
    outs = decode_clips_to_host(
        pipe._syn_cast, clips, size=TINY.input_size,
        decode_batch=TINY.decode_batch, compute_dtype=jnp.float32,
        uint8_transfer=False)
    for (s, f, rd), got in zip(clips, outs):
        ref = decode_latents_to_host(
            pipe._syn_cast, s, f, rd, size=TINY.input_size,
            decode_batch=TINY.decode_batch, compute_dtype=jnp.float32,
            uint8_transfer=False)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_generate_batch_matches_serial(pipe, inputs):
    img, wave = inputs
    rng = np.random.default_rng(23)
    img2 = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.3)
    imgs = jnp.concatenate([img, img2], axis=0)
    waves = jnp.concatenate([wave, wave * 0.5], axis=0)

    outs = pipe.generate_batch(imgs, waves, emotion="happy",
                               seeds=[15, 16])
    assert len(outs) == 2
    for i, seed in enumerate((15, 16)):
        ref = np.asarray(pipe.generate(imgs[i:i + 1], waves[i:i + 1],
                                       emotion="happy", seed=seed))
        assert outs[i].shape == ref.shape
        # uint8 wire quantization on the batch path
        np.testing.assert_allclose(outs[i], ref, atol=1 / 255.0 + 1e-5)


def test_generate_batch_ragged_matches_serial(pipe, inputs):
    """Mixed-length clips in ONE generate_batch call: audio encodes batch
    per length group, the decode shares one dispatch stream, and every
    clip's output is identical to its solo generate (no padding touches
    the audio features)."""
    img, wave = inputs
    waves = [wave[0], wave[0, :8000] * 0.5, wave[0] * 0.8]   # 1 s, 0.5 s, 1 s
    imgs = jnp.concatenate([img, img * 0.9, img], axis=0)

    outs = pipe.generate_batch(imgs, waves, emotion="happy",
                               seeds=[15, 16, 17])
    assert [o.shape[0] for o in outs] == [25, 13, 25]
    for i, seed in enumerate((15, 16, 17)):
        ref = np.asarray(pipe.generate(imgs[i:i + 1], waves[i][None],
                                       emotion="happy", seed=seed))
        assert outs[i].shape == ref.shape
        # uint8 wire quantization on the batch path
        np.testing.assert_allclose(outs[i], ref, atol=1 / 255.0 + 1e-5)


def test_generate_batch_ragged_equal_lengths_collapses_to_batched(pipe, inputs):
    """A ragged list whose lengths happen to match takes the fully
    batched path (one encode_audio) and still matches serial."""
    img, wave = inputs
    outs = pipe.generate_batch(
        jnp.concatenate([img, img], axis=0),
        [wave[0], wave[0] * 0.5], emotion="happy", seeds=[15, 16])
    for i, (w, seed) in enumerate(zip((wave[0], wave[0] * 0.5), (15, 16))):
        ref = np.asarray(pipe.generate(img, w[None], emotion="happy",
                                       seed=seed))
        np.testing.assert_allclose(outs[i], ref, atol=1 / 255.0 + 1e-5)


# ---------------------------------------------------------------------------
# progress plumbing
# ---------------------------------------------------------------------------

def test_float_process_progress_callbacks(pipe, inputs):
    from float_tpu.api.nodes import float_process
    from float_tpu.api.types import FloatPipe
    img, wave = inputs
    fp = FloatPipe(pipe, TINY, weights="synthetic")
    events = []
    frames, _a, _fps = float_process(
        np.asarray(img[0]).transpose(1, 2, 0) * 0.5 + 0.5,
        np.asarray(wave), fp, emotion="happy", progress=lambda *e: events.append(e))
    t = audio_num_frames(wave.shape[-1], TINY)
    import math
    n_chunks = math.ceil(t / TINY.decode_batch)
    sample_evs = [e for e in events if e[0] == "sample"]
    decode_evs = [e for e in events if e[0] == "decode"]
    assert sample_evs == [("sample", 1, 1)]
    assert [e[1] for e in decode_evs] == list(range(1, n_chunks + 1))
    assert all(e[2] == n_chunks for e in decode_evs)
    assert frames.shape[0] == t


def test_decode_to_host_progress_fires_on_completion(pipe, inputs):
    img, wave = inputs
    t = audio_num_frames(16000, TINY)
    s_r, _lam, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)
    we = pipe.emotion_latent(wave, "happy")
    r_d = pipe.sample(r_s, wa, we, seed=1)
    events = []
    pipe.decode_to_host(s_r, feats, r_d,
                        progress=lambda *e: events.append(e))
    import math
    n_chunks = math.ceil(t / TINY.decode_batch)
    assert [e[1] for e in events] == list(range(1, n_chunks + 1))


# ---------------------------------------------------------------------------
# video output
# ---------------------------------------------------------------------------

def test_write_video_silent_plus_wav_sidecar(tmp_path):
    from float_tpu.io.video import write_video, write_wav, have_ffmpeg
    rng = np.random.default_rng(0)
    frames = rng.random((8, 32, 32, 3)).astype(np.float32)
    audio = (rng.random(16000).astype(np.float32) - 0.5) * 0.1
    out = str(tmp_path / "clip.mp4")
    audio_path = write_video(out, frames, 25.0, audio=audio,
                             sample_rate=16000)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    if have_ffmpeg():
        assert audio_path == out
    else:
        assert audio_path.endswith(".wav") and os.path.exists(audio_path)
        import wave as wavmod
        with wavmod.open(audio_path, "rb") as w:
            assert w.getframerate() == 16000
            assert w.getnframes() == 16000


def test_write_video_from_chunks(tmp_path):
    from float_tpu.io.video import write_video
    rng = np.random.default_rng(1)
    chunks = [rng.random((3, 32, 32, 3)).astype(np.float32)
              for _ in range(3)]
    out = str(tmp_path / "chunks.mp4")
    write_video(out, iter(chunks), 25.0)
    assert os.path.getsize(out) > 0


# ---------------------------------------------------------------------------
# face-align custom-detector error mapping (ADVICE r2)
# ---------------------------------------------------------------------------

def test_custom_detector_import_error_not_swallowed():
    from float_tpu.image.face_align import detect_faces

    def broken_detector(img):
        raise ImportError("my_private_dep is missing")

    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ImportError, match="my_private_dep"):
        detect_faces(img, detector=broken_detector, allow_fallback=True)


# ---------------------------------------------------------------------------
# warp-profile persistence (readiness gate, runtime/decode.py)
# ---------------------------------------------------------------------------

def test_warp_profile_roundtrip(tmp_path):
    from float_tpu.runtime import decode as D
    old = dict(D._DISP_RATCHET)
    try:
        D._DISP_RATCHET.clear()
        # index 2 (512²) clamps 4 -> its compile-proven cap 3
        D.seed_ratchet(512, (3, 4, 4))
        assert D._ratchet_get(512) == (3, 4, 3)
        path = str(tmp_path / "warp_profile.json")
        D.save_warp_profile(path, checkpoint="x.safetensors")
        D._DISP_RATCHET.clear()
        prof = D.load_warp_profile(path)
        assert prof["checkpoint"] == "x.safetensors"
        assert D._ratchet_get(512) == (3, 4, 3)
        # monotone: seeding below the current ratchet never shrinks it
        D.seed_ratchet(512, (2, 2, 2))
        assert D._ratchet_get(512) == (3, 4, 3)
        # caps at the per-level compile-proven bounds, floors at
        # DEFAULT_WARP_DISP
        D._DISP_RATCHET.clear()
        D.seed_ratchet(512, (1, 99, 3))
        assert D._ratchet_get(512) == (2, D._disp_caps(512)[1], 3)
        with pytest.raises(ValueError):
            D.seed_ratchet(512, (2, 2))
        # missing profile file is a no-op
        assert D.load_warp_profile(str(tmp_path / "nope.json")) == {}
    finally:
        D._DISP_RATCHET.clear()
        D._DISP_RATCHET.update(old)


def test_ratchet_bumps_on_flag_with_low_probe_stat():
    """ADVICE r2 (medium): when a level's overflow flag fires but the
    4-frame probe subset missed the big flow, the ratchet must still grow
    (else every clip pays the double decode forever)."""
    import jax.numpy as jnp
    from float_tpu.runtime import decode as D
    old = dict(D._DISP_RATCHET)
    try:
        D._DISP_RATCHET.clear()
        D._PATH_RATCHET.clear()
        size = 512
        assert D._ratchet_get(size) == (2, 2, 2)
        # flags layout: per level [beyond-D ovf, max spread]
        stats = [jnp.asarray([2, 2, 2], jnp.int32)]      # probe saw <= D
        flags = [jnp.asarray([0, 1, 1, 2, 0, 1], jnp.int32)]  # lvl1 overflowed
        redo = D._sync_stats_flags(size, stats, flags, ("auto",) * 3)
        assert redo == [0]
        assert D._ratchet_get(size) == (2, 3, 2)         # bumped by 1
        # and a plain stats-driven grow still works
        stats = [jnp.asarray([4, 2, 2], jnp.int32)]
        flags = [jnp.asarray([1, 4, 0, 2, 0, 1], jnp.int32)]
        D._sync_stats_flags(size, stats, flags, ("auto",) * 3)
        assert D._ratchet_get(size) == (4, 3, 2)
    finally:
        D._DISP_RATCHET.clear()
        D._DISP_RATCHET.update(old)


def test_path_ratchet_select_and_demote():
    """Trace-time fast-path selection: first observation picks the
    smallest covering path; later bigger spreads demote (never promote);
    spread misses mark chunks for re-decode."""
    import jax.numpy as jnp
    from float_tpu.runtime import decode as D
    oldd, oldp = dict(D._DISP_RATCHET), dict(D._PATH_RATCHET)
    try:
        D._DISP_RATCHET.clear()
        D._PATH_RATCHET.clear()
        size = 512
        assert D._path_get(size) == ("auto", "auto", "auto")
        # first clip (dispatched auto): spreads 1 / 3 / 5 per level
        stats = [jnp.asarray([2, 2, 2], jnp.int32)]
        flags = [jnp.asarray([0, 1, 0, 3, 0, 5], jnp.int32)]
        redo = D._sync_stats_flags(size, stats, flags, ("auto",) * 3)
        assert redo == []                      # auto covers everything
        assert D._path_get(size) == ("fast3", "fast5", "auto")
        # next clip dispatched with those paths; level 0 now spreads 3
        flags = [jnp.asarray([0, 3, 0, 3, 0, 2], jnp.int32)]
        redo = D._sync_stats_flags(size, stats, flags,
                                   ("fast3", "fast5", "auto"))
        assert redo == [0]                     # fast3 capacity 1 < 3
        assert D._path_get(size) == ("fast5", "fast5", "auto")
        # and a spread-4 clip demotes fast5 -> fast6
        flags = [jnp.asarray([0, 4, 0, 3, 0, 2], jnp.int32)]
        redo = D._sync_stats_flags(size, stats, flags,
                                   ("fast5", "fast5", "auto"))
        assert redo == [0]
        assert D._path_get(size) == ("fast6", "fast5", "auto")
        # no promotion back on a later small-spread clip
        flags = [jnp.asarray([0, 0, 0, 0, 0, 0], jnp.int32)]
        D._sync_stats_flags(size, stats, flags, D._path_get(size))
        assert D._path_get(size) == ("fast6", "fast5", "auto")
        # spread -1 (no stat) keeps auto and never redoes
        D._PATH_RATCHET.clear()
        flags = [jnp.asarray([0, -1, 0, -1, 0, -1], jnp.int32)]
        redo = D._sync_stats_flags(size, stats, flags, ("auto",) * 3)
        assert redo == []
        assert D._path_get(size) == ("auto", "auto", "auto")
    finally:
        D._DISP_RATCHET.clear(); D._DISP_RATCHET.update(oldd)
        D._PATH_RATCHET.clear(); D._PATH_RATCHET.update(oldp)


# ---------------------------------------------------------------------------
# SER long-audio bound (windowed prediction past ser_max_sec)
# ---------------------------------------------------------------------------

def test_predict_emotion_windowed_long_audio(inputs):
    """Clips beyond cfg.ser_max_sec split into windows whose scores are
    length-weight-averaged — the compiled programs only ever see window-
    sized inputs (the memory bound)."""
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    cfg = TINY.replace(ser_max_sec=0.5)          # 8000-sample windows
    p = build_synthetic_pipeline(cfg, TINY_W2V, TINY_SER)

    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.standard_normal((1, 20000)).astype(np.float32) * 0.1)
    got = p.predict_emotion(wave)
    assert got.shape == (1, 7)
    # manual expectation: 8000 + 8000 + 4000 windows, weighted average
    s1 = p._emotion(p.params["emotion"], wave[:, :8000])
    s2 = p._emotion(p.params["emotion"], wave[:, 8000:16000])
    s3 = p._emotion(p.params["emotion"], wave[:, 16000:])
    ref = (np.asarray(s1) * 8000 + np.asarray(s2) * 8000
           + np.asarray(s3) * 4000) / 20000.0
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
    # short clips keep the single-pass path
    short = p.predict_emotion(wave[:, :4000])
    np.testing.assert_allclose(
        np.asarray(short),
        np.asarray(p._emotion(p.params["emotion"], wave[:, :4000])), atol=0)


def test_sampler_dtype_bf16_close_to_f32(inputs):
    """Opt-in bfloat16 FMT sampling tracks the f32 sampler within the
    expected bf16 integration error and feeds the same decode."""
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    img, wave = inputs
    p32 = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    p16 = build_synthetic_pipeline(TINY.replace(sampler_dtype="bfloat16"),
                                   TINY_W2V, TINY_SER)
    t = audio_num_frames(16000, TINY)
    s_r, _lam, feats, r_s = p32.encode_image(img)
    wa = p32.encode_audio(wave, t)
    we = p32.emotion_latent(wave, "happy")
    rd32 = np.asarray(p32.sample(r_s, wa, we, seed=3))
    rd16 = np.asarray(p16.sample(r_s, wa, we, seed=3))
    assert rd16.dtype == np.float32            # returned as f32
    scale = np.abs(rd32).max()
    err = np.abs(rd16 - rd32).max()
    assert err < 0.1 * scale, (err, scale)     # bf16 integration floor


def test_stream_bf16_sampler_compiles_once(inputs):
    """generate_stream under sampler_dtype='bfloat16' must init its carry
    in the SAMPLER dtype: an f32 init would give chunk 0 different carry
    avals than chunk 1+ and silently compile the FMT sampler twice."""
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    img, wave = inputs
    p16 = build_synthetic_pipeline(TINY.replace(sampler_dtype="bfloat16"),
                                   TINY_W2V, TINY_SER)
    parts = [f for _s, f in p16.generate_stream(img, wave, emotion="happy",
                                                seed=3,
                                                uint8_transfer=False)]
    assert sum(p.shape[0] for p in parts) == audio_num_frames(16000, TINY)
    assert p16._sample_chunk._cache_size() == 1, \
        "per-chunk sampler compiled more than once across stream chunks"


def test_aot_cache_pipeline_roundtrip(tmp_path, inputs):
    """FloatPipeline(aot_dir=...): executables persist to disk and a
    FRESH pipeline instance (simulated fresh process) loads + runs them
    producing identical frames; the cache dir really holds blobs."""
    from float_tpu.runtime.pipeline import build_synthetic_pipeline, FloatPipeline
    img, wave = inputs
    d = str(tmp_path / "aot")
    base = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    ref = np.asarray(base.generate(img, wave, emotion="happy", seed=4))

    p1 = FloatPipeline(base.params, TINY, TINY_W2V, TINY_SER, aot_dir=d)
    got1 = np.asarray(p1.generate(img, wave, emotion="happy", seed=4))
    np.testing.assert_allclose(got1, ref, atol=1e-5)
    blobs = [f for f in os.listdir(d) if f.endswith(".aotx")]
    assert blobs, "no executables persisted"

    p2 = FloatPipeline(base.params, TINY, TINY_W2V, TINY_SER, aot_dir=d)
    got2 = np.asarray(p2.generate(img, wave, emotion="happy", seed=4))
    np.testing.assert_allclose(got2, ref, atol=1e-5)


def test_aot_chunk_fn_keeps_remainder_bucketing(tmp_path):
    """The AOT-wrapped decode chunk fn must not disable remainder-chunk
    bucketing (it compiles per shape key, so bucket programs cache fine);
    the mesh shard_map fn (no marker) must still pad to full chunks."""
    from float_tpu.runtime.pipeline import build_synthetic_pipeline, FloatPipeline
    from float_tpu.runtime.decode import _supports_buckets, _chunk_sizes

    assert _supports_buckets(None)
    assert not _supports_buckets(lambda *a, **k: None)   # mesh-style override

    base = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    p = FloatPipeline(base.params, TINY, TINY_W2V, TINY_SER,
                      aot_dir=str(tmp_path / "aot"))
    assert _supports_buckets(p._chunk_fn)
    # and bucketing actually differs: 250 frames at fb=16 -> 15x16 + 1x12
    assert _chunk_sizes(250, 16, bucketed=True) == [16] * 15 + [12]
    assert _chunk_sizes(250, 16, bucketed=False) == [16] * 16


def test_aot_key_includes_code_fingerprint(monkeypatch):
    """Executable cache keys change when the package source changes, so a
    populated cache dir can never serve stale-math executables."""
    from float_tpu.utils import aot_cache as A

    fp = A._code_fingerprint()
    assert fp and fp == A._code_fingerprint()       # stable in-process
    k1 = A._key_of("stage", (np.zeros((2, 3), np.float32),), {})
    monkeypatch.setattr(A, "_code_fingerprint", lambda: "deadbeef")
    k2 = A._key_of("stage", (np.zeros((2, 3), np.float32),), {})
    assert k1 != k2


def test_aot_key_includes_host_fingerprint(monkeypatch):
    """XLA:CPU AOT blobs are host-ISA-specific (device_kind is just
    "cpu" everywhere): a blob from a wider-ISA build host must miss on
    this host instead of risking SIGILL at run time."""
    from float_tpu.utils import aot_cache as A

    fp = A._host_fingerprint()
    assert fp and fp == A._host_fingerprint()       # stable in-process
    k1 = A._key_of("stage", (np.zeros((2, 3), np.float32),), {})
    monkeypatch.setattr(A, "_host_fingerprint", lambda: "otherhost")
    k2 = A._key_of("stage", (np.zeros((2, 3), np.float32),), {})
    assert k1 != k2


def test_aot_broken_blob_recovers(tmp_path, monkeypatch):
    """A blob that deserializes fine but fails when RUN (the observed
    cross-process XLA:CPU mode: "Function ..._fusion not found" at async
    dispatch) must fall back to a fresh compile, not crash the caller."""
    import jax
    from jax.experimental import serialize_executable as se
    from float_tpu.utils.aot_cache import AotCache

    fn = jax.jit(lambda x: x * 2.0 + 1.0)
    x = np.arange(6, dtype=np.float32).reshape(2, 3)

    cache1 = AotCache(str(tmp_path))
    ref = np.asarray(cache1.wrap("toy", fn)(x))
    blobs = [f for f in os.listdir(tmp_path) if f.endswith(".aotx")]
    assert len(blobs) == 1

    def broken_deserialize(*payload):
        def boom(*a, **kw):
            raise RuntimeError("Function broadcast_multiply_fusion.4 "
                               "not found (type id: 1)")
        return boom
    monkeypatch.setattr(se, "deserialize_and_load", broken_deserialize)

    cache2 = AotCache(str(tmp_path))     # fresh instance = fresh process
    got = np.asarray(cache2.wrap("toy", fn)(x))
    np.testing.assert_array_equal(got, ref)
    # the bad blob was replaced by a freshly-serialized one
    assert [f for f in os.listdir(tmp_path) if f.endswith(".aotx")]


def test_decode_gather_mode_runs_off_chip(monkeypatch):
    """use_pallas=False (-> decode use_warp_kernel=False) must decode at
    kernel-eligible sizes/dtypes on a plain CPU backend — no
    interpret-mode wrapper — because pallas_call cannot lower on
    XLA:CPU.  bfloat16 is essential here: with float32 every kernel
    branch is dtype-ineligible anyway and the crash guard would be
    vacuous.  This is the readiness gate's off-chip flow-probe mode
    (tools/readiness_check.py): the exact-gather warp replaces the
    kernels, the D ratchet still learns from the probe stats, the PATH
    ratchet is NOT poisoned (all spreads are -1 = no information), and
    the output matches the NCHW reference-path synthesis at the bf16
    cross-layout floor."""
    import jax
    from float_tpu.models import init as minit
    from float_tpu.models import synthesis as S
    from float_tpu.runtime import decode as RD

    small = {4: 32, 8: 32, 16: 32, 32: 32, 64: 32, 128: 32}
    monkeypatch.setattr(minit, "CHANNELS_MAP", small)
    dec = minit.init_synthesis(128, 32, 20, seed=11)
    # tame the random-init flows (as the interpret-mode tests do): the
    # bf16 cross-layout comparison floor only holds for smooth flows —
    # exactness under big flows is the gather's own contract either way
    for lvl in dec["to_flows"]:
        conv = dec["to_flows"][lvl]["conv"]
        conv["weight"] = conv["weight"] * 0.05
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.standard_normal((1, small[r], r, r))
                         .astype(np.float32) * 0.5)
             for r in (8, 16, 32, 64, 128)]
    s_r = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32) * 0.3)
    r_d = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32) * 0.3)

    RD._DISP_RATCHET.pop(128, None)
    RD._PATH_RATCHET.pop(128, None)
    try:
        # NO force_tpu_interpret_mode here: this would crash in pallas
        # lowering if the kernel path were still dispatched (bf16 at 128²
        # is kernel-eligible, so only the use_warp_kernel threading
        # prevents the dispatch)
        frames = RD.decode_latents(dec, s_r, feats, r_d, size=128,
                                   decode_batch=4,
                                   compute_dtype=jnp.bfloat16,
                                   use_warp_kernel=False)
        frames = jax.block_until_ready(frames)
        assert frames.shape == (6, 128, 128, 3)
        # the probe learned the clip regime's D despite no kernels ...
        assert RD._ratchet_get(128)[0] >= 2
        # ... but the PATH ratchet got no entry (spread -1 = no info);
        # a ('auto',)*n first observation would be demotion-locked and,
        # persisted + reseeded, would disable fast paths on the chip
        assert 128 not in RD._PATH_RATCHET
        prof_paths = ("auto",)
        assert RD.seed_paths(128, prof_paths) == prof_paths
        assert 128 not in RD._PATH_RATCHET      # all-auto seed is a no-op

        dt = jnp.bfloat16
        dec16 = RD._cast_params(dec, dt)
        feats16 = [f.astype(dt) for f in feats]
        wa = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dt)
        ref, _ = S.synthesis(dec16, wa, feats16, 128)
        ref = (jnp.clip(ref.astype(jnp.float32), -1.0, 1.0) + 1.0) * 0.5
        ref = jnp.transpose(ref, (0, 2, 3, 1))
        err = float(jnp.max(jnp.abs(frames - ref)))
        # sanity bound only: both sides are bf16 and the NCHW/NHWC conv
        # accumulation orders differ per level, compounding to ~0.1 on
        # random-init weights.  The TIGHT cross-layout parity is covered
        # in f32 by test_motion_ae::test_synthesis_channels_last_parity
        # (rtol/atol 1e-3 vs the imported reference's weights).
        assert err < 0.15, err
    finally:
        RD._DISP_RATCHET.pop(128, None)
        RD._PATH_RATCHET.pop(128, None)


def test_path_fold_ignores_no_information():
    """_path_fold must not create a (demotion-locked) entry from an
    all-negative spread vector, and must still keep per-level -1s from
    real kernel observations pinned to their current selection."""
    from float_tpu.runtime import decode as RD

    RD._PATH_RATCHET.pop(512, None)                # 512² has 3 levels
    try:
        got = RD._path_fold(512, np.asarray([-1, -1, -1]))
        assert got == ("auto", "auto", "auto")
        assert 512 not in RD._PATH_RATCHET         # no entry created
        # a spread vector whose length mismatches the size's level count
        # is ignored too (it would poison the warp-profile roundtrip)
        got = RD._path_fold(512, np.asarray([2]))
        assert got == ("auto", "auto", "auto")
        assert 512 not in RD._PATH_RATCHET
        # first REAL observation still selects per level (-1 level stays
        # auto: a non-v2 level never reports a spread)
        got = RD._path_fold(512, np.asarray([2, -1, 4]))
        assert got == ("fast4", "auto", "fast6")
        assert RD._PATH_RATCHET[512] == got
        # later no-information folds keep the selection
        got = RD._path_fold(512, np.asarray([-1, -1, -1]))
        assert got == ("fast4", "auto", "fast6")
    finally:
        RD._PATH_RATCHET.pop(512, None)
