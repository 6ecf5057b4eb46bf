"""Workflow runner + observability tests (tiny pipeline)."""
import numpy as np
import pytest

from float_tpu.api.types import FloatPipe
from float_tpu.runtime.pipeline import build_synthetic_pipeline
from float_tpu.runtime.workflow import run_workflow
from float_tpu.utils.inspect import count_params, architecture_table, num2str
from float_tpu.utils.profiling import Profiler, ProgressCallback

from test_pipeline import TINY, TINY_W2V, TINY_SER


@pytest.fixture(scope="module")
def pipe():
    return FloatPipe(build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER),
                     TINY, weights="synthetic")


@pytest.fixture(scope="module")
def face_img(rng_mod=np.random.default_rng(1)):
    return rng_mod.random((64, 64, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def wave():
    return np.random.default_rng(2).standard_normal(12000).astype(np.float32) * 0.1


def test_workflow_default(pipe, face_img, wave):
    wf = {"mode": "default", "image": face_img, "audio": wave,
          "emotion": "happy", "seed": 3}
    frames = run_workflow(wf, output="", pipe=pipe)
    assert frames.shape == (19, 64, 64, 3)     # ceil(12000*25/16000)=19
    assert np.isfinite(frames).all()


def test_workflow_dynamic_emotion(pipe, face_img, wave):
    wf = {"mode": "dynamic_emotion", "image": face_img, "audio": wave,
          "chunk_duration_sec": 0.25, "seed": 3}
    frames = run_workflow(wf, output="", pipe=pipe)
    assert frames.shape == (19, 64, 64, 3)


def test_workflow_insert_two_faces(pipe, wave):
    bg = np.random.default_rng(3).random((128, 160, 3)).astype(np.float32)
    # face_align='fallback' opts into the center-crop path (no
    # face_alignment dep in this environment; strict raise otherwise)
    wf = {"mode": "insert", "image": bg, "audio": wave,
          "faces": [1, 2], "seed": 3, "face_align": "fallback"}
    frames = run_workflow(wf, output="", pipe=pipe)
    # composited output keeps the original background geometry per frame
    assert frames.shape == (19, 128, 160, 3)
    assert np.isfinite(frames).all()


def test_workflow_unknown_mode(pipe, face_img, wave):
    with pytest.raises(ValueError):
        run_workflow({"mode": "bogus", "image": face_img, "audio": wave},
                     output="", pipe=pipe)


def test_param_counting(pipe):
    params = pipe.pipeline.params
    total = sum(count_params(v) for v in params.values())
    assert total > 0
    table = architecture_table(params)
    assert "TOTAL" in table and "fmt" in table
    assert num2str(1_500_000) == "1.50 M"
    assert num2str(2_500) == "2.50 K"


def test_profiler_stages(pipe, face_img, wave):
    import jax.numpy as jnp
    prof = Profiler()
    img = jnp.asarray(np.transpose(face_img, (2, 0, 1))[None] * 2 - 1)
    with prof.stage("encode", sync_on=None):
        out = pipe.pipeline.encode_image(img)
    with prof.stage("encode_synced", sync_on=out[0]):
        out = pipe.pipeline.encode_image(img)
    s = prof.stages.summary()
    assert "encode" in s and "encode_synced" in s and s["encode_synced"] > 0
    assert "encode" in prof.stages.report()


def test_progress_callback():
    seen = []
    pb = ProgressCallback(5, on_update=lambda d, t: seen.append((d, t)))
    for _ in range(5):
        pb.update()
    assert seen[-1] == (5, 5)
