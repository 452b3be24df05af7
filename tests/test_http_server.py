"""HTTP serving API test: create stream, POST frames (npy + JPEG), answer
(plain + SSE streaming), metrics, delete — against a live ThreadingHTTPServer
on a tiny dry-run model (serve/http_server.py)."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from flash_vstream_tpu.serve.cli_server import build_session, make_parser
from flash_vstream_tpu.serve.http_server import serve_http


def _req(url, method="GET", data=None, content_type="application/json"):
    if isinstance(data, dict):
        data = json.dumps(data).encode()
    r = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        r.add_header("Content-Type", content_type)
    try:
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server():
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run", "--clip-size", "2",
        "--max-new-tokens", "4"])
    httpd = serve_http(lambda: build_session(args), port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()


def _frames_npy(n, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(n, h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_http_end_to_end(server):
    code, health = _req(f"{server}/healthz")
    assert code == 200 and health["ok"]

    code, out = _req(f"{server}/v1/streams", "POST", {"id": "s1"})
    assert code == 201 and out["id"] == "s1"

    # batch-of-4 npy upload: 2 full clips ingest, nothing buffered
    code, out = _req(f"{server}/v1/streams/s1/frames", "POST",
                     _frames_npy(4), content_type="application/octet-stream")
    assert code == 200 and out["frames_total"] == 4 and out["buffered"] == 0

    # single JPEG upload buffers (clip_size=2)
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, format="JPEG")
    code, out = _req(f"{server}/v1/streams/s1/frames", "POST",
                     buf.getvalue(), content_type="image/jpeg")
    assert code == 200 and out["buffered"] == 1

    # answer flushes the buffered tail frame, then decodes
    code, out = _req(f"{server}/v1/streams/s1/answer", "POST",
                     {"question": "What is happening?",
                      "max_new_tokens": 4})
    assert code == 200 and isinstance(out["answer"], str)

    code, out = _req(f"{server}/v1/streams/s1/metrics")
    assert code == 200 and out["frames_received"] == 5
    assert out["frames_buffered"] == 0
    assert "memory_latency_dispatch" in out["metrics"]

    code, out = _req(f"{server}/v1/streams/s1", "DELETE")
    assert code == 200 and out["deleted"] == "s1"
    code, _ = _req(f"{server}/v1/streams/s1/metrics")
    assert code == 404


def test_http_sse_streaming_answer(server):
    code, out = _req(f"{server}/v1/streams", "POST", {"id": "sse"})
    assert code == 201
    code, _ = _req(f"{server}/v1/streams/sse/frames", "POST", _frames_npy(2),
                   content_type="application/octet-stream")
    assert code == 200
    r = urllib.request.Request(
        f"{server}/v1/streams/sse/answer", method="POST",
        data=json.dumps({"question": "Q?", "max_new_tokens": 4,
                         "stream": True}).encode())
    r.add_header("Content-Type", "application/json")
    deltas, done = [], False
    with urllib.request.urlopen(r, timeout=120) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for line in resp:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            deltas.append(json.loads(payload)["delta"])
    assert done and len(deltas) >= 1
    assert all(isinstance(d, str) for d in deltas)


def test_http_errors(server):
    code, out = _req(f"{server}/v1/streams/missing/answer", "POST",
                     {"question": "?"})
    assert code == 404
    code, out = _req(f"{server}/v1/streams", "POST", {"id": "dup"})
    assert code == 201
    code, out = _req(f"{server}/v1/streams", "POST", {"id": "dup"})
    assert code == 409 and "exists" in out["error"]
    # malformed frame payload -> 400
    code, out = _req(f"{server}/v1/streams/dup/frames", "POST",
                     b"not an npy", content_type="application/octet-stream")
    assert code == 400


def test_http_llava_family(tmp_path):
    """The HTTP layer is family-generic: a LLaVA-family dry-run session
    serves the same API (sessions share the answer/answer_stream surface)."""
    args = make_parser().parse_args([
        "--model-family", "llava", "--dry-run", "--clip-size", "2",
        "--max-new-tokens", "4"])
    httpd = serve_http(lambda: build_session(args), port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        code, out = _req(f"{base}/v1/streams", "POST", {"id": "lv"})
        assert code == 201
        code, _ = _req(f"{base}/v1/streams/lv/frames", "POST",
                       _frames_npy(2), content_type="application/octet-stream")
        assert code == 200
        code, out = _req(f"{base}/v1/streams/lv/answer", "POST",
                         {"question": "Q?", "max_new_tokens": 4})
        assert code == 200 and isinstance(out["answer"], str)
    finally:
        httpd.shutdown()


def test_http_streams_share_compiled_jits():
    """Stream N+1 must not re-trace/compile: registry sessions clone the
    first session's jits (StreamServer._new_session -> clone_fresh)."""
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run", "--clip-size", "2"])
    httpd = serve_http(lambda: build_session(args), port=0)
    try:
        reg = httpd.registry
        a, b = reg.create("a"), reg.create("b")
        sa, sb = reg.get(a).session, reg.get(b).session
        assert sa._ingest is sb._ingest
        assert sa.generator is sb.generator
        assert sa is not sb
    finally:
        httpd.server_close()


def test_http_prewarm_template(tmp_path):
    """--prewarm compiles answer buckets on the TEMPLATE session before
    traffic; stream 1 gets the (reset) template, later streams clone it."""
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.serve.cli_server import prewarm_session
    from flash_vstream_tpu.utils.logging import build_logger
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run", "--clip-size", "2",
        "--max-new-tokens", "4", "--prewarm"])
    httpd = serve_http(lambda: build_session(args), port=0)
    try:
        sess = httpd.registry._new_session()
        prewarm_session(
            sess, args,
            GenerationConfig(max_new_tokens=4,
                             eos_token_ids=(sess.tokenizer.eos_token_id,)),
            build_logger("test_http_prewarm"))
        sid = httpd.registry.create("first")
        first = httpd.registry.get(sid).session
        # every stream clones the prewarmed template: shared compiled jits
        # (incl. the fused-answer cache populated by prewarm), fresh state
        assert first._ingest is sess._ingest
        assert first._assemble_cache is sess._assemble_cache
        assert len(sess._assemble_cache) >= 1   # prewarm compiled answers
        assert first._published == (None, 0)
        sid2 = httpd.registry.create("second")
        assert httpd.registry.get(sid2).session._ingest is sess._ingest
    finally:
        httpd.server_close()


def test_http_answer_before_frames_is_400(server):
    code, _ = _req(f"{server}/v1/streams", "POST", {"id": "empty"})
    assert code == 201
    code, out = _req(f"{server}/v1/streams/empty/answer", "POST",
                     {"question": "Q?"})
    assert code == 400 and "no frames" in out["error"]
