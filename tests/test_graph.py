"""ComfyUI workflow-graph executor tests.

The reference ships 10 example workflow JSONs (SURVEY §3.3/§3.5); the
graph executor (runtime/graph.py + api/comfy.py) runs that serialized
format directly.  Execution tests drive the reference's own files with
tiny-config models; format tests cover the litegraph quirks (seed
control_after_generate phantom values, dict-form widgets, subgraph
flattening).
"""
import json
import os

import numpy as np
import pytest

from float_tpu.runtime.graph import (GraphError, bind_widget_values,
                                     flatten_graph, run_graph, _toposort)
from float_tpu.api.comfy import ADAPTERS, GraphContext, run_comfy_workflow

from test_pipeline import TINY, TINY_W2V, TINY_SER

REF_WF_DIR = "/root/reference/example_workflows"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_WF_DIR), reason="reference workflows not present")


# ---------------------------------------------------------------------------
# format-level tests (no models)
# ---------------------------------------------------------------------------

def test_bind_widgets_list_form_with_seed_control():
    node = {"inputs": [{"name": "a_cfg_scale", "widget": {"name": "a_cfg_scale"}},
                       {"name": "seed", "widget": {"name": "seed"}},
                       {"name": "fps", "widget": {"name": "fps"}},
                       {"name": "ref_image", "link": 3}],
            "widgets_values": [2.0, 15, "fixed", 25.0]}
    assert bind_widget_values(node) == {
        "a_cfg_scale": 2.0, "seed": 15, "fps": 25.0}


def test_bind_widgets_dict_form():
    node = {"inputs": [{"name": "frame_rate", "widget": {"name": "frame_rate"}},
                       {"name": "format", "widget": {"name": "format"}}],
            "widgets_values": {"frame_rate": 25, "format": "video/mp4",
                               "extra_ui_state": {"x": 1}}}
    assert bind_widget_values(node) == {"frame_rate": 25,
                                        "format": "video/mp4"}


def test_bind_widgets_short_values():
    node = {"inputs": [{"name": "a", "widget": {"name": "a"}},
                       {"name": "b", "widget": {"name": "b"}}],
            "widgets_values": [1]}
    assert bind_widget_values(node) == {"a": 1}


def test_unknown_node_type_raises():
    wf = {"nodes": [{"id": 1, "type": "NoSuchNode", "inputs": [],
                     "outputs": [], "mode": 0}], "links": []}
    with pytest.raises(GraphError, match="NoSuchNode"):
        run_graph(wf, ADAPTERS, GraphContext())


def test_cycle_detection():
    wf = {"nodes": [
        {"id": 1, "type": "A", "inputs": [{"name": "x", "link": 1}],
         "outputs": [{"name": "y"}], "mode": 0},
        {"id": 2, "type": "A", "inputs": [{"name": "x", "link": 2}],
         "outputs": [{"name": "y"}], "mode": 0}],
        "links": [[1, 2, 0, 1, 0, "*"], [2, 1, 0, 2, 0, "*"]]}
    with pytest.raises(GraphError, match="cycle"):
        _toposort(flatten_graph(wf))


def test_reroute_passthrough():
    """Classic Reroute nodes forward their input source transparently."""
    wf = {"nodes": [
        {"id": 1, "type": "PrimitiveFloat", "mode": 0,
         "inputs": [{"name": "value", "widget": {"name": "value"}}],
         "outputs": [{"name": "FLOAT"}], "widgets_values": [3.5]},
        {"id": 2, "type": "Reroute", "mode": 0,
         "inputs": [{"name": "", "link": 1}], "outputs": [{"name": ""}]},
        {"id": 3, "type": "PrimitiveFloat", "mode": 0,
         "inputs": [{"name": "value", "widget": {"name": "value"},
                     "link": 2}],
         "outputs": [{"name": "FLOAT"}], "widgets_values": []}],
        "links": [[1, 1, 0, 2, 0, "FLOAT"], [2, 2, 0, 3, 0, "FLOAT"]]}
    nodes = flatten_graph(wf)
    assert "2" not in nodes                      # reroute has no ExecNode
    src = nodes["3"].conn.get("value")
    assert src == ("node", "1", 0)


def test_converted_widget_input_prefers_link():
    """A widget 'converted to input' (widget key + link) takes the linked
    value; the stale widgets_values slot is ignored."""
    wf = {"nodes": [
        {"id": 1, "type": "PrimitiveFloat", "mode": 0,
         "inputs": [{"name": "value", "widget": {"name": "value"}}],
         "outputs": [{"name": "FLOAT"}], "widgets_values": [30.0]},
        {"id": 2, "type": "FloatProcessOpt", "mode": 0,
         "inputs": [{"name": "fps", "widget": {"name": "fps"}, "link": 1},
                    {"name": "seed", "widget": {"name": "seed"}}],
         "outputs": [{"name": "images"}],
         "widgets_values": [25.0, 15, "fixed"]}],
        "links": [[1, 1, 0, 2, 0, "FLOAT"]]}
    nodes = flatten_graph(wf)
    n2 = nodes["2"]
    assert n2.conn["fps"] == ("node", "1", 0)   # link wins
    assert n2.widgets["fps"] == 25.0            # stale value still parsed
    assert n2.widgets["seed"] == 15


def test_mute_propagates_none():
    """A muted producer yields None outputs; consumers see None inputs."""
    seen = {}

    def probe(ctx, inputs):
        seen.update(inputs)
        return [inputs.get("value")]
    registry = dict(ADAPTERS)
    registry["Probe"] = probe
    wf = {"nodes": [
        {"id": 1, "type": "PrimitiveFloat", "mode": 2,
         "inputs": [{"name": "value", "widget": {"name": "value"}}],
         "outputs": [{"name": "FLOAT"}], "widgets_values": [4.0]},
        {"id": 2, "type": "Probe", "mode": 0,
         "inputs": [{"name": "value", "link": 1}],
         "outputs": [{"name": "out"}]}],
        "links": [[1, 1, 0, 2, 0, "FLOAT"]]}
    results = run_graph(wf, registry, GraphContext())
    assert seen["value"] is None and results["2"] == [None]


def test_muted_and_bypassed_subgraph_instances():
    """Muting a subgraph instance yields None outputs without expanding
    its body; bypass passes same-typed inputs through."""
    sg = {"id": "aaaa", "name": "wrap", "inputNode": {"id": -10},
          "outputNode": {"id": -20},
          "inputs": [{"name": "x", "type": "FLOAT"}],
          "outputs": [{"name": "y", "type": "FLOAT"}],
          "nodes": [{"id": 5, "type": "ExplodingNode", "mode": 0,
                     "inputs": [{"name": "x", "link": 0}],
                     "outputs": [{"name": "y"}]}],
          "links": [{"id": 0, "origin_id": -10, "origin_slot": 0,
                     "target_id": 5, "target_slot": 0, "type": "FLOAT"},
                    {"id": 1, "origin_id": 5, "origin_slot": 0,
                     "target_id": -20, "target_slot": 0, "type": "FLOAT"}]}

    def make_wf(mode):
        return {"definitions": {"subgraphs": [sg]},
                "nodes": [
            {"id": 1, "type": "PrimitiveFloat", "mode": 0,
             "inputs": [{"name": "value", "widget": {"name": "value"}}],
             "outputs": [{"name": "FLOAT", "type": "FLOAT"}],
             "widgets_values": [7.0]},
            {"id": 2, "type": "aaaa", "mode": mode,
             "inputs": [{"name": "x", "link": 1, "type": "FLOAT"}],
             "outputs": [{"name": "y", "type": "FLOAT",
                          "links": [2]}]},
            {"id": 3, "type": "PrimitiveFloat", "mode": 0,
             "inputs": [{"name": "value", "widget": {"name": "value"},
                         "link": 2}],
             "outputs": [{"name": "FLOAT", "type": "FLOAT"}],
             "widgets_values": []}],
            "links": [[1, 1, 0, 2, 0, "FLOAT"], [2, 2, 0, 3, 0, "FLOAT"]]}

    from float_tpu.runtime.graph import MODE_MUTE, MODE_BYPASS
    # mute: inner ExplodingNode is never instantiated, consumer sees None
    nodes = flatten_graph(make_wf(MODE_MUTE))
    assert not any(n.type == "ExplodingNode" for n in nodes.values())
    results = run_graph(make_wf(MODE_MUTE), ADAPTERS, GraphContext())
    assert results["3"] == [0.0]        # PrimitiveFloat default on None
    # bypass: value flows straight through the instance
    results = run_graph(make_wf(MODE_BYPASS), ADAPTERS, GraphContext())
    assert results["3"] == [7.0]


def test_reroute_cycle_and_dangling_link_raise_grapherror():
    def reroute(nid, link_in):
        return {"id": nid, "type": "Reroute", "mode": 0,
                "inputs": [{"name": "", "link": link_in}],
                "outputs": [{"name": ""}]}
    probe = {"id": 3, "type": "PrimitiveFloat", "mode": 0,
             "inputs": [{"name": "value", "widget": {"name": "value"},
                         "link": 3}],
             "outputs": [{"name": "FLOAT"}], "widgets_values": []}
    cyc = {"nodes": [reroute(1, 2), reroute(2, 1), probe],
           "links": [[1, 2, 0, 1, 0, "*"], [2, 1, 0, 2, 0, "*"],
                     [3, 1, 0, 3, 0, "*"]]}
    with pytest.raises(GraphError, match="cycle"):
        flatten_graph(cyc)
    dangling = {"nodes": [reroute(1, 99), probe],
                "links": [[3, 1, 0, 3, 0, "*"]]}
    with pytest.raises(GraphError, match="link 99"):
        flatten_graph(dangling)


def test_face_align_adapter_uses_index_widget(monkeypatch):
    """The node's widget is named 'index' (reference nodes_adv.py:81) —
    the two-face insert workflows rely on index=2 for the second face."""
    import float_tpu.api.nodes as N
    seen = {}

    def fake(image, **kw):
        seen.update(kw)
        return np.zeros((1, 4, 4, 3), np.float32), [(0, 0, 4, 4)]
    monkeypatch.setattr(N, "float_image_face_align", fake)
    out = ADAPTERS["FloatImageFaceAlign"](
        GraphContext(), {"image": np.zeros((1, 8, 8, 3)), "index": 2,
                         "size": 64})
    assert seen["face_index"] == 2 and seen["input_size"] == 64
    assert len(out) == 2


def test_read_wav_file_sample_widths(tmp_path):
    """8/16/24/32-bit PCM wavs all decode to the same float signal."""
    import wave as wavmod
    from float_tpu.audio.resample import read_wav_file
    t = np.linspace(0, 1, 800, endpoint=False)
    ref = (0.5 * np.sin(2 * np.pi * 7 * t)).astype(np.float32)
    for width in (1, 2, 3, 4):
        if width == 1:
            data = ((ref * 128) + 128).astype(np.uint8).tobytes()
        elif width == 2:
            data = (ref * 32767).astype("<i2").tobytes()
        elif width == 3:
            i32 = (ref * 8388607).astype(np.int32)
            b = np.zeros((len(i32), 3), np.uint8)
            b[:, 0] = i32 & 0xFF
            b[:, 1] = (i32 >> 8) & 0xFF
            b[:, 2] = (i32 >> 16) & 0xFF
            data = b.tobytes()
        else:
            data = (ref * 2147483647).astype("<i4").tobytes()
        p = tmp_path / f"w{width}.wav"
        with wavmod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(16000)
            w.writeframes(data)
        arr, sr = read_wav_file(str(p))
        assert sr == 16000 and arr.shape == (1, 800)
        tol = {1: 1e-2, 2: 1e-4, 3: 1e-6, 4: 1e-7}[width]
        np.testing.assert_allclose(arr[0], ref, atol=tol)


def test_out_path_creates_prefix_subdirs(tmp_path):
    ctx = GraphContext(output_dir=str(tmp_path / "o"))
    p = ctx.out_path("sub/dir/file.npy")
    np.save(p, np.zeros(3))
    assert os.path.exists(p)


@needs_reference
@pytest.mark.parametrize("name", sorted(
    f for f in (os.listdir(REF_WF_DIR) if os.path.isdir(REF_WF_DIR) else [])
    if f.endswith(".json")))
def test_reference_workflows_flatten_and_register(name):
    """Every reference workflow flattens (subgraphs expanded), topo-sorts,
    and every node type has an adapter."""
    with open(os.path.join(REF_WF_DIR, name)) as f:
        wf = json.load(f)
    nodes = flatten_graph(wf)
    assert nodes, "no executable nodes"
    order = _toposort(nodes)
    assert len(order) == len(nodes)
    missing = sorted({n.type for n in nodes.values()
                      if n.type not in ADAPTERS})
    assert not missing, f"unregistered node types: {missing}"


@needs_reference
def test_subgraph_flattening_wires_boundaries():
    """Nested-subgraph workflow: instance inputs/outputs resolve through
    the -10/-20 boundary pseudo-nodes to real producers."""
    with open(os.path.join(REF_WF_DIR,
                           "float_very_advanced_subgraphs.json")) as f:
        wf = json.load(f)
    nodes = flatten_graph(wf)
    # every connection source must point at an existing flattened node
    for n in nodes.values():
        for src in n.conn.values():
            if src and src[0] == "node":
                assert src[1] in nodes, (n.key, n.type, src)
    # the VHS sink must transitively consume an ApplyFloatSynthesis
    sinks = [n for n in nodes.values() if n.type == "VHS_VideoCombine"]
    assert sinks
    syn = [n for n in nodes.values() if n.type == "ApplyFloatSynthesis"]
    assert syn and all("/" in n.key for n in syn)   # lives inside a subgraph


# ---------------------------------------------------------------------------
# execution tests (tiny models, reference's own workflow files)
# ---------------------------------------------------------------------------

def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


@pytest.fixture(scope="module")
def tiny_pipe():
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    from float_tpu.api.types import FloatPipe
    p = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    return FloatPipe(p, TINY, weights="synthetic")


@pytest.fixture(scope="module")
def graph_io(tmp_path_factory, tiny_pipe):
    """Inputs dir (64² image npy + 1 s audio npy) + output dir."""
    d = tmp_path_factory.mktemp("graph_io")
    rng = np.random.default_rng(7)
    np.save(d / "img.npy", rng.random((64, 64, 3)).astype(np.float32))
    np.save(d / "aud.npy",
            (rng.standard_normal(16000) * 0.1).astype(np.float32))
    return d


@pytest.fixture(scope="module")
def tiny_model_store(tmp_path_factory, tiny_pipe):
    """A <models_root> tree with tiny part files + HF dirs, mirroring the
    reference store layout (io/download.py conventions)."""
    from safetensors.numpy import save_file
    from float_tpu.io.download import extract_part
    root = tmp_path_factory.mktemp("store")
    p = tiny_pipe.pipeline.params

    flat = {}
    flat.update(_flatten_tree(p["encoder"], "motion_autoencoder.enc"))
    flat.update(_flatten_tree(p["synthesis"], "motion_autoencoder.dec"))
    flat.update(_flatten_tree(p["audio_encoder"]["wav2vec2"],
                              "audio_encoder.wav2vec2"))
    flat.update(_flatten_tree(p["audio_encoder"]["audio_projection"],
                              "audio_encoder.audio_projection"))
    emo = dict(p["emotion"])
    cls = emo.pop("classifier")
    flat.update(_flatten_tree(emo, "emotion_encoder.wav2vec2_for_emotion.wav2vec2"))
    flat.update(_flatten_tree(cls, "emotion_encoder.wav2vec2_for_emotion.classifier"))
    flat.update(_flatten_tree(p["fmt"], "fmt"))
    unified = root / "float" / "FLOAT.safetensors"
    unified.parent.mkdir(parents=True)
    save_file(flat, str(unified))

    for key, rel in [("encoder", "float/motion_autoencoder/encoder.safetensors"),
                     ("decoder", "float/motion_autoencoder/decoder.safetensors"),
                     ("projection", "float/audio_projections/projection.safetensors"),
                     ("fmt", "float/fmt/fmt.safetensors")]:
        assert extract_part(str(unified), key, str(root / rel))

    # HF dirs (config.json + model.safetensors), tiny configs
    def hf_dir(name, cfg_obj, weights, extra):
        d = root / "audio" / name
        d.mkdir(parents=True)
        cfg = {"hidden_size": cfg_obj.hidden_size,
               "num_hidden_layers": cfg_obj.num_hidden_layers,
               "num_attention_heads": cfg_obj.num_attention_heads,
               "intermediate_size": cfg_obj.intermediate_size,
               "conv_dim": list(cfg_obj.conv_dim),
               "conv_kernel": list(cfg_obj.conv_kernel),
               "conv_stride": list(cfg_obj.conv_stride),
               "conv_bias": cfg_obj.conv_bias,
               "feat_extract_norm": cfg_obj.feat_extract_norm,
               "do_stable_layer_norm": cfg_obj.do_stable_layer_norm,
               "num_conv_pos_embeddings": cfg_obj.num_conv_pos_embeddings,
               "num_conv_pos_embedding_groups":
                   cfg_obj.num_conv_pos_embedding_groups, **extra}
        (d / "config.json").write_text(json.dumps(cfg))
        save_file(weights, str(d / "model.safetensors"))

    hf_dir("wav2vec2-base-960h", TINY_W2V,
           _flatten_tree(p["audio_encoder"]["wav2vec2"]), {})
    ser_weights = _flatten_tree(emo, "wav2vec2")
    ser_weights.update(_flatten_tree(cls, "classifier"))
    hf_dir("wav2vec-english-speech-emotion-recognition", TINY_SER,
           ser_weights,
           {"id2label": {str(i): lbl for i, lbl in enumerate(
               ["angry", "disgust", "fear", "happy", "neutral", "sad",
                "surprise"])}})
    return root


def _ctx(graph_io, tmp_path, pipe=None, store=None, extra_overrides=None):
    overrides = {"LoadImage": {"image": "img.npy"},
                 "LoadAudio": {"audio": "aud.npy"},
                 "SET_ImageDownload": {"filename": "img.npy"},
                 "SET_AudioDownload": {"filename": "aud.npy"}}
    overrides.update(extra_overrides or {})
    return GraphContext(models_root=str(store) if store else "models",
                        inputs_dir=str(graph_io),
                        output_dir=str(tmp_path / "out"),
                        float_pipe=pipe, overrides=overrides)


@needs_reference
def test_run_reference_regular_workflow(graph_io, tmp_path, tiny_pipe):
    """float_workflow.json (Regular tier) end-to-end on the tiny pipe."""
    ctx = _ctx(graph_io, tmp_path, pipe=tiny_pipe)
    path = os.path.join(REF_WF_DIR, "float_workflow.json")
    results, ctx = run_comfy_workflow(path, ctx)
    nodes = flatten_graph(json.load(open(path)))
    key = next(k for k, n in nodes.items() if n.type == "FloatProcessOpt")
    frames = results[key][0]
    assert frames.shape == (25, 64, 64, 3)          # 1 s @ 25 fps, tiny 64²
    assert np.isfinite(np.asarray(frames)).all()
    assert ctx.artifacts and ctx.artifacts[0].endswith(".mp4")


@needs_reference
def test_run_reference_advanced_workflow(graph_io, tmp_path, tiny_pipe):
    """float_adv.json (Advanced tier): split encode/sample/decode stages
    against one shared FLOAT_PIPE."""
    ctx = _ctx(graph_io, tmp_path, pipe=tiny_pipe)
    results, ctx = run_comfy_workflow(
        os.path.join(REF_WF_DIR, "float_adv.json"), ctx)
    by_type = {}
    nodes = flatten_graph(json.load(
        open(os.path.join(REF_WF_DIR, "float_adv.json"))))
    for k, n in nodes.items():
        by_type.setdefault(n.type, []).append(results.get(k))
    r_d = by_type["FloatSampleMotionSequenceRD"][0][0]
    assert r_d.shape == (1, 25, TINY.dim_w)
    frames = by_type["FloatDecodeLatentsToImages"][0][0]
    assert frames.shape == (25, 64, 64, 3)


@needs_reference
def test_graph_equals_direct_function_calls(graph_io, tmp_path, tiny_pipe):
    """The graph layer is a pure adapter: running float_adv.json produces
    EXACTLY the arrays the api.nodes functions return when called with
    the same widget values (same seeds, same order)."""
    from float_tpu.api import nodes as N
    path = os.path.join(REF_WF_DIR, "float_adv.json")
    ctx = _ctx(graph_io, tmp_path, pipe=tiny_pipe)
    results, _ = run_comfy_workflow(path, ctx)
    nodes = flatten_graph(json.load(open(path)))
    by_type = {n.type: k for k, n in nodes.items()}
    sampler = nodes[by_type["FloatSampleMotionSequenceRD"]]

    img = np.load(graph_io / "img.npy")[None]
    audio = {"waveform": np.load(graph_io / "aud.npy")[None][None],
             "sample_rate": 16000}
    app, lam = N.float_encode_image_to_latents(tiny_pipe, img)
    r_s = N.float_get_identity_reference(tiny_pipe, lam)
    enc_audio = nodes[by_type["FloatEncodeAudioToLatentWA"]]
    wa, t, processed = N.float_encode_audio_to_wa(
        tiny_pipe, audio, fps=float(enc_audio.widgets.get("fps", 25.0)))
    emo = nodes[by_type["FloatEncodeEmotionToLatentWE"]]
    we = N.float_encode_emotion_to_we(
        tiny_pipe, processed, emotion=emo.widgets.get("emotion", "none"))
    r_d = N.float_sample_motion_sequence(
        tiny_pipe, r_s, wa, we, audio_num_frames=t,
        a_cfg_scale=float(sampler.widgets["a_cfg_scale"]),
        e_cfg_scale=float(sampler.widgets["e_cfg_scale"]),
        seed=int(sampler.widgets["seed"]))
    frames, _fps = N.float_decode_latents_to_images(tiny_pipe, app, r_d)

    np.testing.assert_array_equal(
        np.asarray(results[by_type["FloatSampleMotionSequenceRD"]][0]),
        np.asarray(r_d))
    np.testing.assert_array_equal(
        np.asarray(results[by_type["FloatDecodeLatentsToImages"]][0]),
        np.asarray(frames))


@needs_reference
def test_run_reference_va_subgraph_workflow(graph_io, tmp_path,
                                            tiny_model_store):
    """float_very_advanced_subgraphs.json: nested subgraphs, every network
    loaded from the tiny model store by the VA loader nodes."""
    ctx = _ctx(graph_io, tmp_path, store=tiny_model_store,
               extra_overrides={
                   "LoadFMTModel": {"num_heads": TINY.num_heads,
                                    "wav2vec_sec": TINY.wav2vec_sec,
                                    "num_prev_frames": TINY.num_prev_frames},
               })
    path = os.path.join(REF_WF_DIR, "float_very_advanced_subgraphs.json")
    results, ctx = run_comfy_workflow(path, ctx)
    frames = [v[0] for v in results.values()
              if v and getattr(v[0], "ndim", 0) == 4
              and getattr(v[0], "shape", ())[-1] == 3]
    assert any(f.shape == (25, 64, 64, 3) for f in frames)
    assert ctx.artifacts
    # conditioning_chunk_size = prev + current (reference
    # nodes_vadv_loader.py:864): 3 + 0.4 s * 25 fps = 13 for TINY
    nodes = flatten_graph(json.load(open(path)))
    fmt_key = next(k for k, n in nodes.items() if n.type == "LoadFMTModel")
    assert results[fmt_key][3] == TINY.num_prev_frames + int(
        TINY.wav2vec_sec * 25)


@needs_reference
def test_run_reference_two_face_insert_workflow(graph_io, tmp_path,
                                                tiny_model_store):
    """float_very_advanced_sub_insert_2.json: two FLOAT subgraph instances
    + face-align (fallback crop) + SET_CompositeFace reinsert."""
    ctx = _ctx(graph_io, tmp_path, store=tiny_model_store,
               extra_overrides={
                   "LoadFMTModel": {"num_heads": TINY.num_heads,
                                    "wav2vec_sec": TINY.wav2vec_sec,
                                    "num_prev_frames": TINY.num_prev_frames},
                   "FloatImageFaceAlign": {"allow_fallback": True,
                                           "size": 64},
               })
    results, ctx = run_comfy_workflow(
        os.path.join(REF_WF_DIR, "float_very_advanced_sub_insert_2.json"),
        ctx)
    nodes = flatten_graph(json.load(open(
        os.path.join(REF_WF_DIR, "float_very_advanced_sub_insert_2.json"))))
    comp_keys = [k for k, n in nodes.items()
                 if n.type.startswith("SET_CompositeFace")]
    assert comp_keys
    for k in comp_keys:
        out = results[k][0]
        # composited frames have the ORIGINAL image's spatial size
        assert out.shape[1:] == (64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()
    assert ctx.artifacts


def test_bundled_graph_example(graph_io, tmp_path, tiny_pipe):
    """example_workflows/graph_regular.json (our authored ComfyUI-format
    example, usable without the reference checkout) runs end-to-end."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "example_workflows", "graph_regular.json")
    ctx = _ctx(graph_io, tmp_path, pipe=tiny_pipe)
    results, ctx = run_comfy_workflow(path, ctx)
    assert results["4"][0].shape == (25, 64, 64, 3)
    assert ctx.artifacts and ctx.artifacts[0].endswith(".mp4")


def test_cli_graph_subcommand(graph_io, tmp_path, tiny_pipe, monkeypatch):
    """CLI `graph` command parses --set overrides and executes a minimal
    authored graph (LoadImage -> PreviewImage)."""
    from float_tpu import cli
    wf = {"nodes": [
        {"id": 1, "type": "LoadImage", "mode": 0,
         "inputs": [{"name": "image", "widget": {"name": "image"}}],
         "outputs": [{"name": "IMAGE"}, {"name": "MASK"}],
         "widgets_values": ["nonexistent.png"]},
        {"id": 2, "type": "PreviewImage", "mode": 0,
         "inputs": [{"name": "images", "link": 1}], "outputs": []}],
        "links": [[1, 1, 0, 2, 0, "IMAGE"]]}
    wf_path = tmp_path / "mini_graph.json"
    wf_path.write_text(json.dumps(wf))
    out_dir = tmp_path / "cli_out"
    cli.main(["graph", str(wf_path),
              "--inputs-dir", str(graph_io),
              "--output-dir", str(out_dir),
              "--set", "LoadImage.image=img.npy",
              "--no-progress"])
    saved = list(out_dir.glob("*.npy"))
    assert len(saved) == 1
    assert np.load(saved[0]).shape == (1, 64, 64, 3)
