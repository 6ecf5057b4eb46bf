"""HTTP serving daemon tests (tiny pipe, real sockets on loopback)."""
import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from float_tpu.serve import make_server
from float_tpu.api.types import FloatPipe

from test_pipeline import TINY, TINY_W2V, TINY_SER


@pytest.fixture(scope="module")
def fpipe():
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    return FloatPipe(build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER),
                     TINY, weights="synthetic")


@pytest.fixture(scope="module")
def server(fpipe):
    httpd = make_server(fpipe, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _npy_b64(arr) -> str:
    buf = io.BytesIO()
    np.save(buf, arr)
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, obj, timeout=600):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(11)
    return {"image": _npy_b64(rng.random((64, 64, 3)).astype(np.float32)),
            "audio": _npy_b64(
                (rng.standard_normal(16000) * 0.1).astype(np.float32)),
            "seed": 15}


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["weights"] == "synthetic"
    assert body["busy"] is False


def test_generate_mp4(server, payload):
    with _post(server + "/v1/generate", payload) as r:
        assert r.headers["Content-Type"] == "video/mp4"
        assert int(r.headers["X-Frames"]) == 25     # 1 s @ 25 fps
        video = r.read()
    assert len(video) > 1000                        # a real mp4 container


def test_generate_stream_ndjson(server, payload):
    req = dict(payload, stream=True)
    starts, total = [], 0
    with _post(server + "/v1/generate", req) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        for line in r:
            msg = json.loads(line)
            arr = np.frombuffer(base64.b64decode(msg["data"]),
                                dtype=np.uint8).reshape(msg["shape"])
            assert arr.shape[1:] == (64, 64, 3)
            starts.append(msg["start"])
            total += arr.shape[0]
    assert total == 25 and starts == sorted(starts) and starts[0] == 0


def test_stream_matches_oneshot(server, payload):
    """The streamed frames equal the one-shot mp4 path's frames (same
    seed) — compare via a second stream call determinism check."""
    req = dict(payload, stream=True)

    def collect():
        chunks = []
        with _post(server + "/v1/generate", req) as r:
            for line in r:
                msg = json.loads(line)
                chunks.append(np.frombuffer(
                    base64.b64decode(msg["data"]),
                    dtype=np.uint8).reshape(msg["shape"]))
        return np.concatenate(chunks, axis=0)
    a, b = collect(), collect()
    np.testing.assert_array_equal(a, b)


def test_graph_endpoint(server, payload):
    wf = {"nodes": [
        {"id": 1, "type": "LoadImage", "mode": 0,
         "inputs": [{"name": "image", "widget": {"name": "image"}}],
         "outputs": [{"name": "IMAGE"}, {"name": "MASK"}],
         "widgets_values": ["img.npy"]},
        {"id": 2, "type": "PreviewImage", "mode": 0,
         "inputs": [{"name": "images", "link": 1}], "outputs": []}],
        "links": [[1, 1, 0, 2, 0, "IMAGE"]]}
    body = {"workflow": wf, "inputs": {"img.npy": payload["image"]}}
    with _post(server + "/v1/graph", body) as r:
        out = json.loads(r.read())
    assert len(out["artifacts"]) == 1
    (name, b64), = out["artifacts"].items()
    arr = np.load(io.BytesIO(base64.b64decode(b64)))
    assert arr.shape == (1, 64, 64, 3)


def test_bad_request_is_400(server):
    try:
        _post(server + "/v1/generate", {"image": "not-base64!!"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code in (400, 500)
        body = json.loads(e.read())
        assert "error" in body


def test_client_roundtrip(server, payload):
    """FloatClient mirrors the endpoints: health, stream, graph."""
    from float_tpu.client import FloatClient
    rng = np.random.default_rng(11)
    img = rng.random((64, 64, 3)).astype(np.float32)
    aud = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    c = FloatClient(server)
    assert c.health()["status"] == "ok"
    total = 0
    for start, frames in c.stream(img, aud, seed=15):
        assert frames.dtype == np.uint8 and frames.shape[1:] == (64, 64, 3)
        total += frames.shape[0]
    assert total == 25
    wf = {"nodes": [
        {"id": 1, "type": "LoadImage", "mode": 0,
         "inputs": [{"name": "image", "widget": {"name": "image"}}],
         "outputs": [{"name": "IMAGE"}, {"name": "MASK"}],
         "widgets_values": ["img.npy"]},
        {"id": 2, "type": "PreviewImage", "mode": 0,
         "inputs": [{"name": "images", "link": 1}], "outputs": []}],
        "links": [[1, 1, 0, 2, 0, "IMAGE"]]}
    arts = c.run_graph(wf, inputs={"img.npy": img})
    assert len(arts) == 1
    (blob,) = arts.values()
    assert np.load(io.BytesIO(blob)).shape == (1, 64, 64, 3)


def test_generate_batch_groups_by_length(server):
    """Mixed-length clips: same-length pair takes the batched path, the
    odd one its own group; order and per-clip frame counts preserved."""
    from float_tpu.client import FloatClient
    rng = np.random.default_rng(5)
    img = rng.random((64, 64, 3)).astype(np.float32)
    aud1 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    aud2 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    aud3 = (rng.standard_normal(8000) * 0.1).astype(np.float32)   # 0.5 s
    c = FloatClient(server)
    out = c.generate_batch([{"image": img, "audio": aud1},
                            {"image": img, "audio": aud3},
                            {"image": img, "audio": aud2}])
    assert [o["frames"] for o in out] == [25, 13, 25]   # ceil(0.5*25)=13
    assert all(len(o["video"]) > 1000 for o in out)


def test_metrics_counts_generated_frames(server, payload):
    """Runs after the generate tests (module-scoped server): counters
    reflect the frames produced and busy time accrued."""
    with _post(server + "/v1/generate", payload) as r:
        r.read()
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["frames"] >= 25 and m["requests"] >= 1
    assert m["busy_seconds"] > 0
    assert m["frames_per_busy_second"] > 0


def test_unknown_path_404(server):
    try:
        _post(server + "/v1/nope", {})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_concurrent_requests_serialize(server, payload):
    """Two simultaneous generates both succeed (queued on the chip
    mutex), and health stays responsive while they run."""
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(lambda: _post(server + "/v1/generate",
                                        payload).read())
                for _ in range(2)]
        with urllib.request.urlopen(server + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        videos = [f.result() for f in futs]
    assert all(len(v) > 1000 for v in videos)


def test_mesh_mode_serving():
    """The daemon serves a mesh-built pipeline (2x2 CPU mesh): batch
    endpoint shards clips over the data axis, outputs match the
    single-device server's for the same seeds."""
    from float_tpu.client import FloatClient
    from float_tpu.parallel.mesh import make_mesh
    from float_tpu.runtime.pipeline import (FloatPipeline,
                                            build_synthetic_pipeline)
    single = build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER)
    mesh = make_mesh(4, data=2, model=2)
    meshed = FloatPipeline(single.params, TINY, TINY_W2V, TINY_SER,
                           mesh=mesh)
    rng = np.random.default_rng(9)
    img = rng.random((64, 64, 3)).astype(np.float32)
    auds = [(rng.standard_normal(16000) * 0.1).astype(np.float32)
            for _ in range(2)]
    outs = {}
    for tag, pl in [("single", single), ("mesh", meshed)]:
        httpd = make_server(FloatPipe(pl, TINY, weights="synthetic"),
                            host="127.0.0.1", port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            c = FloatClient(f"http://127.0.0.1:{httpd.server_address[1]}")
            outs[tag] = c.generate_batch(
                [{"image": img, "audio": auds[0], "seed": 15},
                 {"image": img, "audio": auds[1], "seed": 16}])
        finally:
            httpd.shutdown()
    assert [o["frames"] for o in outs["mesh"]] == [25, 25]
    # mp4 containers may differ byte-wise across runs only via content;
    # same frames -> same bytes with this writer
    for a, b in zip(outs["single"], outs["mesh"]):
        assert a["frames"] == b["frames"]
        assert a["video"] == b["video"]


# ---------------------------------------------------------------------------
# concurrency contract (round-4): the generation lock covers device work
# only; slow readers stall only themselves; saturation answers 503
# ---------------------------------------------------------------------------

def test_stalled_reader_aborts_generation(fpipe, payload):
    """A stream consumer that stops reading with a full buffer gets its
    generation aborted after stream_stall_timeout and the chip is FREED
    (transport-free: exercises FloatServer + _StreamBuffer directly).
    Budget 0.06 MB < one 4-frame NDJSON line, so the producer can hold at
    most one queued line and blocks on the next."""
    import time
    from float_tpu.serve import FloatServer, _ReaderStalled

    srv = FloatServer(fpipe, max_pending=2, stream_buffer_mb=0.06,
                      stream_stall_timeout=0.5)
    buf = srv.stream_generate(dict(payload, stream=True))
    it = iter(buf)
    first = next(it)                       # consume ONE line, then stall
    assert json.loads(first)["start"] == 0
    # stop consuming entirely: whatever the generation speed, the
    # producer must fill the buffer, block, and abort within the stall
    # timeout of its LAST admitted put
    deadline = time.time() + 120
    while srv.metrics()["stream_aborts"] == 0 and time.time() < deadline:
        time.sleep(0.05)
    assert srv.metrics()["stream_aborts"] == 1
    assert not srv.lock.locked(), "abort must release the generation lock"
    # the drain surfaces the abort after the already-queued lines
    got, err = 0, None
    try:
        for _line in it:
            got += 1
    except _ReaderStalled as exc:
        err = exc
    assert err is not None, "consumer must see the abort"
    assert got <= 2                        # only the already-queued lines
    # the chip is usable immediately: a full generate succeeds
    video, n = srv.handle_generate(payload)
    assert n == 25 and len(video) > 1000


def test_busy_saturation_raises(fpipe, payload):
    """Beyond max_pending the server refuses instead of queueing."""
    from float_tpu.serve import FloatServer, _Busy

    srv = FloatServer(fpipe, max_pending=1)
    with srv._admit():
        with pytest.raises(_Busy):
            srv.handle_generate(payload)
    assert srv.metrics()["rejected_busy"] == 1
    # after release the same request is admitted again
    _video, n = srv.handle_generate(payload)
    assert n == 25


def test_busy_maps_to_http_503_with_retry_after(fpipe, payload):
    """Socket-level: a saturated server answers 503 + Retry-After."""
    httpd = make_server(fpipe, host="127.0.0.1", port=0, max_pending=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/generate"
        try:
            _post(url, payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert int(e.headers["Retry-After"]) >= 1
            assert "busy" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()


def test_slow_stream_reader_does_not_block_other_clients(server, payload):
    """Client A opens a stream, reads ONE line and pauses; client B's
    full generate must complete while A is paused (generation runs into
    the buffer and releases the lock; client I/O is outside it).  A then
    drains its complete stream."""
    import http.client
    host, port = server.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=120)
    body = json.dumps(dict(payload, stream=True))
    conn.request("POST", "/v1/generate", body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    first = resp.readline()                # one NDJSON line
    assert json.loads(first)["start"] == 0

    # B: a full mp4 generate on a second connection while A is paused
    with _post(server + "/v1/generate", payload, timeout=120) as r:
        assert int(r.headers["X-Frames"]) == 25
        r.read()

    # A drains the rest of its stream intact
    total = np.frombuffer(base64.b64decode(json.loads(first)["data"]),
                          dtype=np.uint8).reshape(
                              json.loads(first)["shape"]).shape[0]
    for line in resp:
        if not line.strip():
            continue
        msg = json.loads(line)
        total += np.frombuffer(base64.b64decode(msg["data"]),
                               dtype=np.uint8).reshape(msg["shape"]).shape[0]
    conn.close()
    assert total == 25


def test_metrics_reports_latency_and_queue(server):
    """After the requests above: percentile summaries + queue depth."""
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["queue_depth"] == 0
    lat = m["latency_seconds"]
    assert lat and lat["count"] >= 1
    assert 0 <= lat["p50"] <= lat["p95"] <= lat["max"]
    assert m["lock_wait_seconds"]["count"] >= 1


def test_oversized_body_413(payload):
    """Bodies over MAX_BODY are rejected before being read."""
    from float_tpu.runtime.pipeline import build_synthetic_pipeline
    pipe = FloatPipe(build_synthetic_pipeline(TINY, TINY_W2V, TINY_SER),
                     TINY, weights="synthetic")
    httpd = make_server(pipe, host="127.0.0.1", port=0)
    httpd.RequestHandlerClass.MAX_BODY = 100
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/generate"
        try:
            _post(url, payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        httpd.shutdown()
