"""Multi-device sharding correctness on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from float_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from float_tpu.parallel.sharding import (
    fmt_param_shardings, wav2vec2_param_shardings, replicate_params,
    shard_pytree,
)
from float_tpu.models.fmt import fmt_forward
from float_tpu.models.init import init_fmt, init_wav2vec2
from float_tpu.models.wav2vec2 import wav2vec2_standard

from test_pipeline import TINY, TINY_W2V

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(8, data=8)
    assert mesh2.devices.shape == (8, 1)
    with pytest.raises(ValueError):
        make_mesh(8, data=3, model=3)


def test_fmt_tp_matches_replicated(rng):
    """Megatron-sharded FMT forward == replicated forward."""
    params = init_fmt(TINY, seed=5)
    mesh = make_mesh(8)

    b, clip, prev = 2, TINY.num_frames_for_clip, TINY.num_prev_frames
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (mk(1), mk(b, clip, TINY.dim_w), mk(b, clip, TINY.dim_a),
            mk(b, TINY.dim_w), mk(b, 1, TINY.dim_e),
            mk(b, prev, TINY.dim_w), mk(b, prev, TINY.dim_a))

    kw = dict(depth=TINY.fmt_depth, num_heads=TINY.num_heads,
              attention_window=TINY.attention_window)

    ref = fmt_forward(params, *args, None, **kw)

    shardings = fmt_param_shardings(params, mesh)
    params_sh = shard_pytree(params, shardings)
    data_in = tuple(jax.device_put(a, batch_sharding(mesh, a.ndim))
                    if a.ndim >= 2 else jax.device_put(a, replicated(mesh))
                    for a in args)

    fn = jax.jit(lambda p, *a: fmt_forward(p, *a, None, **kw))
    with mesh:
        out = fn(params_sh, *data_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    # qkv weights really are sharded over the model axis
    qkv = params_sh["blocks"]["0"]["attn"]["qkv"]["weight"]
    assert qkv.sharding.spec == P("model", None)


def test_wav2vec2_tp_matches_replicated(rng):
    params = init_wav2vec2(TINY_W2V, seed=6)
    mesh = make_mesh(8)
    wave = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)

    ref = wav2vec2_standard(params, wave, TINY_W2V)

    params_sh = shard_pytree(params, wav2vec2_param_shardings(params, mesh))
    wave_sh = jax.device_put(wave, batch_sharding(mesh, 2))
    fn = jax.jit(lambda p, w: wav2vec2_standard(p, w, TINY_W2V))
    with mesh:
        out = fn(params_sh, wave_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_frame_parallel_decode_matches(rng):
    """Frames sharded over all devices decode identically."""
    from float_tpu.models.init import init_synthesis, init_encoder
    from float_tpu.models.encoder import encode_image
    from float_tpu.models.synthesis import synthesis

    enc = init_encoder(32, 32, 20, seed=7)
    dec = init_synthesis(32, 32, 20, seed=8)
    x = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    h, _, feats = encode_image(enc, x, 32, 32)
    wa = h + jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32) * 0.1)

    ref, _ = synthesis(dec, wa, feats, 32)

    mesh = make_mesh(8)
    wa_sh = jax.device_put(wa, NamedSharding(mesh, P(("data", "model"), None)))
    dec_sh = shard_pytree(dec, replicate_params(dec, mesh))
    feats_sh = [jax.device_put(f, replicated(mesh)) for f in feats]
    fn = jax.jit(lambda p, w, fe: synthesis(p, w, fe, 32)[0])
    with mesh:
        out = fn(dec_sh, wa_sh, feats_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_mesh_mode_matches_single_device(rng):
    """FloatPipeline(mesh=...): the first-class multi-chip mode produces
    IDENTICAL frames to the single-device pipeline (frame-parallel
    shard_map decode + TP towers; VERDICT round-2 item 8)."""
    from float_tpu.runtime.pipeline import (FloatPipeline,
                                            build_synthetic_pipeline)
    from test_pipeline import TINY, TINY_W2V, TINY_SER

    ref_pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    cfg8 = TINY.replace(decode_batch=8)     # divisible by the 8-dev mesh
    mesh = make_mesh(8)
    mesh_pipe = FloatPipeline(ref_pipe.params, cfg8, TINY_W2V, TINY_SER,
                              mesh=mesh)

    img = jnp.asarray(rng.standard_normal(
        (1, 3, TINY.input_size, TINY.input_size)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)

    ref_frames = ref_pipe.generate(img, wave, emotion="happy", seed=11)
    with mesh:
        got_frames = mesh_pipe.generate(img, wave, emotion="happy", seed=11)
    assert got_frames.shape == ref_frames.shape
    np.testing.assert_allclose(np.asarray(got_frames),
                               np.asarray(ref_frames), rtol=2e-4, atol=2e-4)

    # the mode really sharded: FMT qkv over "model", decode ran shard_map
    qkv = mesh_pipe.params["fmt"]["blocks"]["0"]["attn"]["qkv"]["weight"]
    assert qkv.sharding.spec == P("model", None)
    assert mesh_pipe._chunk_fn is not None


def test_mesh_dynamic_emotion_sampler_matches(rng):
    """Dynamic per-frame emotion sampling under the mesh (TP FMT) ==
    single-device (VERDICT r2 #6)."""
    from float_tpu.runtime.pipeline import (FloatPipeline,
                                            build_synthetic_pipeline)
    from test_pipeline import TINY, TINY_W2V, TINY_SER

    ref_pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    mesh = make_mesh(8)
    mesh_pipe = FloatPipeline(ref_pipe.params, TINY.replace(decode_batch=8),
                              TINY_W2V, TINY_SER, mesh=mesh)

    img = jnp.asarray(rng.standard_normal(
        (1, 3, TINY.input_size, TINY.input_size)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    from float_tpu.runtime.pipeline import audio_num_frames
    t = audio_num_frames(16000, TINY)
    e = np.exp(rng.standard_normal((1, t, TINY.dim_e)))
    we = jnp.asarray((e / e.sum(-1, keepdims=True)).astype(np.float32))

    s_r, _lam, feats, r_s = ref_pipe.encode_image(img)
    wa = ref_pipe.encode_audio(wave, t)
    ref_rd = ref_pipe.sample(r_s, wa, we, seed=4)
    with mesh:
        got_rd = mesh_pipe.sample(r_s, wa, we, seed=4)
    np.testing.assert_allclose(np.asarray(got_rd), np.asarray(ref_rd),
                               rtol=2e-4, atol=2e-4)


def test_mesh_long_audio_bucketing_matches(rng):
    """Long-audio shape bucketing (padded trailing chunks) under the mesh
    == single-device, and the bucket really padded (VERDICT r2 #6)."""
    import math
    from float_tpu.runtime.pipeline import (FloatPipeline,
                                            build_synthetic_pipeline,
                                            audio_num_frames)
    from float_tpu.runtime.sampling import bucket_n_chunks
    from test_pipeline import TINY, TINY_W2V, TINY_SER

    ref_pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    mesh = make_mesh(8)
    mesh_pipe = FloatPipeline(ref_pipe.params, TINY.replace(decode_batch=8),
                              TINY_W2V, TINY_SER, mesh=mesh)

    img = jnp.asarray(rng.standard_normal(
        (1, 3, TINY.input_size, TINY.input_size)).astype(np.float32) * 0.3)
    # 6 sampler chunks -> bucket 10 (the >5 rounding kicks in)
    n_samp = int(6 * TINY.num_frames_for_clip / TINY.fps * TINY.sampling_rate)
    wave = jnp.asarray(rng.standard_normal((1, n_samp)).astype(np.float32) * 0.1)
    t = audio_num_frames(n_samp, TINY)
    assert bucket_n_chunks(math.ceil(t / TINY.num_frames_for_clip)) == 10

    s_r, _lam, feats, r_s = ref_pipe.encode_image(img)
    wa = ref_pipe.encode_audio(wave, t)
    we = ref_pipe.emotion_latent(wave, "happy")
    ref_rd = ref_pipe.sample(r_s, wa, we, seed=9)
    with mesh:
        got_rd = mesh_pipe.sample(r_s, wa, we, seed=9)
    assert got_rd.shape == (1, t, TINY.dim_w)
    np.testing.assert_allclose(np.asarray(got_rd), np.asarray(ref_rd),
                               rtol=2e-4, atol=2e-4)


def test_mesh_generate_batch_matches_serial(rng):
    """generate_batch under the mesh: per-clip outputs identical to the
    serial single-device path (VERDICT r2 #2 mesh criterion)."""
    from float_tpu.runtime.pipeline import (FloatPipeline,
                                            build_synthetic_pipeline)
    from test_pipeline import TINY, TINY_W2V, TINY_SER

    ref_pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    mesh = make_mesh(8)
    mesh_pipe = FloatPipeline(ref_pipe.params, TINY.replace(decode_batch=8),
                              TINY_W2V, TINY_SER, mesh=mesh)

    imgs = jnp.asarray(rng.standard_normal((2, 3, TINY.input_size,
                                            TINY.input_size)).astype(np.float32) * 0.3)
    waves = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    with mesh:
        outs = mesh_pipe.generate_batch(imgs, waves, emotion="happy",
                                        seeds=[21, 22])
    for i, seed in enumerate((21, 22)):
        ref = np.asarray(ref_pipe.generate(imgs[i:i + 1], waves[i:i + 1],
                                           emotion="happy", seed=seed))
        np.testing.assert_allclose(outs[i], ref, atol=1 / 255.0 + 2e-4)


def test_mesh_ragged_generate_batch_matches_serial(rng):
    """RAGGED batch under the mesh (VERDICT r4 weak #3 / next #4):
    mixed-length clips still ride the data axis — the image encode
    shards over the full clip batch and each audio length group shards
    when its size divides the axis — with outputs identical to serial
    single-device generates."""
    from float_tpu.runtime.pipeline import (FloatPipeline,
                                            build_synthetic_pipeline)
    from test_pipeline import TINY, TINY_W2V, TINY_SER

    ref_pipe = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    mesh = make_mesh(8, data=2, model=4)
    mesh_pipe = FloatPipeline(ref_pipe.params, TINY.replace(decode_batch=8),
                              TINY_W2V, TINY_SER, mesh=mesh)

    imgs = jnp.asarray(rng.standard_normal(
        (4, 3, TINY.input_size, TINY.input_size)).astype(np.float32) * 0.3)
    # two length groups of 2 (each divides data=2) -> both shard; the
    # batch of 4 images shards the encode
    lens = (8000, 16000, 8000, 16000)
    waves = [jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
             for n in lens]
    seeds = [31, 32, 33, 34]
    with mesh:
        outs = mesh_pipe.generate_batch(imgs, waves, emotion="none",
                                        seeds=seeds)
    from float_tpu.runtime.pipeline import audio_num_frames
    for i, seed in enumerate(seeds):
        assert outs[i].shape[0] == audio_num_frames(lens[i], TINY)
        ref = np.asarray(ref_pipe.generate(imgs[i:i + 1], waves[i][None],
                                           emotion="none", seed=seed))
        np.testing.assert_allclose(outs[i], ref, atol=1 / 255.0 + 2e-4)
