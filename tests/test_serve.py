"""Serving surface: dynamic batching engine + HTTP endpoint (CPU)."""

import json
import threading
import types
import urllib.request

import numpy as np
import pytest

import jax

from unopticalflow_tpu.models import FlowModelConfig, init_flow_model

H, W = 64, 64
RNG = np.random.RandomState(13)


@pytest.fixture(scope="module")
def engine():
    import serve

    cfg = types.SimpleNamespace(img_hw=(H, W), num_scales=3)
    params = init_flow_model(jax.random.PRNGKey(0))
    srv = serve.FlowServer(
        cfg, params, FlowModelConfig(num_scales=3), max_batch=4, max_wait_ms=20,
    )
    yield srv
    srv.close()


def test_single_inference(engine):
    pair = RNG.rand(2 * H, W, 3).astype(np.float32)
    flow = engine.infer(pair)
    assert flow.shape == (H, W, 2)
    assert np.isfinite(flow).all()


def test_concurrent_requests_batch_together(engine):
    pairs = [RNG.rand(2 * H, W, 3).astype(np.float32) for _ in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = engine.infer(pairs[i])

    before = engine.stats["batches"]
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r.shape == (H, W, 2) for r in results)
    # concurrent arrivals share batches: 4 requests in at most 3 dispatches
    assert engine.stats["batches"] - before <= 3
    # padding rows must not leak: same pair solo == same pair batched
    solo = engine.infer(pairs[0])
    np.testing.assert_allclose(solo, results[0], rtol=1e-5, atol=1e-5)


def test_expired_requests_are_shed(engine):
    """Load shedding: the device loop skips requests whose waiter timed out."""
    import time

    import serve

    expired = serve._Request(
        np.zeros((2 * H, W, 3), np.float32), time.perf_counter() - 1.0
    )
    before = engine.stats["shed"]
    engine.queue.put(expired)
    # a live request enqueued behind it must still be served normally
    flow = engine.infer(RNG.rand(2 * H, W, 3).astype(np.float32))
    assert flow.shape == (H, W, 2)
    assert expired.event.is_set()
    assert isinstance(expired.error, TimeoutError)
    assert engine.stats["shed"] == before + 1


def test_handler_status_codes_for_server_faults():
    """Decode errors are 400; overload is 503; internal faults are 500."""
    import cv2
    import urllib.error
    from http.server import ThreadingHTTPServer

    import serve

    img = RNG.randint(0, 255, (2 * H, W, 3), np.uint8)
    ok, png = cv2.imencode(".png", img)
    assert ok
    cfg = types.SimpleNamespace(img_hw=(H, W))

    class Stub:
        max_batch = 4
        stats = {}

        def __init__(self, exc):
            self.exc = exc

        def infer(self, pair):
            raise self.exc

    for exc, want in (
        (TimeoutError("shed: overload"), 503),
        (RuntimeError("device fault"), 500),
    ):
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), serve.make_handler(Stub(exc), cfg)
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/flow", data=png.tobytes(),
                method="POST",
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                assert False, f"expected HTTP {want}"
            except urllib.error.HTTPError as e:
                assert e.code == want
                assert "error" in json.loads(e.read())
        finally:
            httpd.shutdown()


def test_http_endpoint(engine, tmp_path):
    import cv2
    from http.server import ThreadingHTTPServer

    import serve

    cfg = types.SimpleNamespace(img_hw=(H, W))
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(engine, cfg)
    )
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["img_hw"] == [H, W]

        img = RNG.randint(0, 255, (2 * H, W, 3), np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/flow", data=png.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = r.read()
        # Middlebury .flo: magic, W, H, then H*W*2 f32
        assert np.frombuffer(body[:4], np.float32)[0] == np.float32(202021.25)
        w, h = np.frombuffer(body[4:12], np.int32)
        assert (w, h) == (W, H)
        flow = np.frombuffer(body[12:], np.float32).reshape(h, w, 2)
        assert np.isfinite(flow).all()

        # error path: garbage body -> 400 with a JSON error
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/flow", data=b"notanimage", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_spatial_serving_matches_dp(engine):
    """--spatial N: height-sharded serving returns the same flow as the
    default engine (H=128 to satisfy H % (spatial*64) == 0)."""
    import types

    import serve

    h2 = 128
    cfg = types.SimpleNamespace(img_hw=(h2, W), num_scales=3)
    params = init_flow_model(jax.random.PRNGKey(0))
    sp = serve.FlowServer(
        cfg, params, FlowModelConfig(num_scales=3),
        max_batch=2, max_wait_ms=5, spatial=2,
    )
    try:
        pair = RNG.rand(2 * h2, W, 3).astype(np.float32)
        flow_sp = sp.infer(pair)
        assert flow_sp.shape == (h2, W, 2)
        # reference: single-device jit of the same model/params
        from unopticalflow_tpu.models import inference_flow

        ref = np.asarray(
            jax.jit(
                lambda i1, i2: inference_flow(
                    params, FlowModelConfig(num_scales=3), i1, i2
                )
            )(pair[None, :h2], pair[None, h2:])
        )[0]
        np.testing.assert_allclose(flow_sp, ref, rtol=2e-5, atol=2e-5)
    finally:
        sp.close()


def test_oversized_body_rejected_413(engine, tmp_path):
    """Content-Length above the cap is rejected before buffering."""
    import http.client
    import socket
    import threading as _threading

    import serve

    handler = serve.make_handler(engine, types.SimpleNamespace(img_hw=(H, W)))
    httpd = serve.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = _threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.putrequest("POST", "/flow")
        conn.putheader("Content-Length", str(serve.MAX_BODY_BYTES + 1))
        conn.endheaders()
        # send nothing further; the server must answer from the header alone
        resp = conn.getresponse()
        assert resp.status == 413
        assert "error" in json.loads(resp.read())
        conn.close()
    finally:
        httpd.shutdown()


def test_failed_batches_counted_as_errors():
    """A device fault must not inflate the served counter."""
    import types as _types

    import serve

    class Boom:
        def __call__(self, *a, **k):
            raise RuntimeError("device fault")

    srv = serve.FlowServer.__new__(serve.FlowServer)
    srv.h, srv.w = H, W
    srv.max_batch = 2
    srv._pad_batch = 2
    srv.max_wait = 0.001
    srv.queue = __import__("queue").Queue()
    srv.stats = {"served": 0, "batches": 0, "shed": 0, "errors": 0,
                 "occupancy": [0] * 3}
    srv._jax = jax
    srv._infer = Boom()
    srv._stop = __import__("threading").Event()
    srv._thread = __import__("threading").Thread(target=srv._loop, daemon=True)
    srv._thread.start()
    try:
        pair = RNG.rand(2 * H, W, 3).astype(np.float32)
        with pytest.raises(RuntimeError, match="device fault"):
            srv.infer(pair, timeout=10)
        assert srv.stats["errors"] == 1
        assert srv.stats["served"] == 0
        assert srv.stats["batches"] == 1
    finally:
        srv.close()
