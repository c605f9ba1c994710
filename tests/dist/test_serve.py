"""Serving-layer tests: batcher invariants + HTTP endpoints (SURVEY.md
§5.4 'continuous-batcher invariants')."""
import threading
import time

import numpy as np
import pytest

from tf2_tpu.serve.batcher import ContinuousBatcher


def _echo_runner(calls):
    def run(batch):
        calls.append(batch.shape[0])
        return batch * 2.0
    return run


def test_batcher_roundtrip_and_order():
    calls = []
    b = ContinuousBatcher(_echo_runner(calls), batch_size=4,
                          example_shape=(3,), max_wait_s=0.01).start()
    futs = [b.submit(np.full((3,), i, np.float32)) for i in range(10)]
    outs = [f.result(5) for f in futs]
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, np.full((3,), 2.0 * i))
    b.stop()
    s = b.stats()
    assert s["requests"] == 10
    assert s["batches"] >= 3  # 10 reqs / batch of 4


def test_batcher_pads_lone_request():
    calls = []
    b = ContinuousBatcher(_echo_runner(calls), batch_size=8,
                          example_shape=(2,), max_wait_s=0.001).start()
    out = b.submit(np.ones((2,), np.float32)).result(5)
    np.testing.assert_array_equal(out, 2 * np.ones((2,)))
    b.stop()
    assert b.stats()["avg_occupancy"] <= 0.5  # lone request padded


def test_batcher_error_propagates():
    def boom(batch):
        raise RuntimeError("kaboom")
    b = ContinuousBatcher(boom, batch_size=2, example_shape=(1,)).start()
    fut = b.submit(np.zeros((1,), np.float32))
    with pytest.raises(RuntimeError, match="kaboom"):
        fut.result(5)
    b.stop(drain=False)


def test_batcher_rejects_bad_shape():
    b = ContinuousBatcher(lambda x: x, batch_size=2, example_shape=(4,))
    with pytest.raises(ValueError):
        b.submit(np.zeros((5,), np.float32))


def test_batcher_concurrent_clients():
    calls = []
    b = ContinuousBatcher(_echo_runner(calls), batch_size=8,
                          example_shape=(1,), max_wait_s=0.005).start()
    results = {}

    def client(i):
        results[i] = b.submit(np.full((1,), i, np.float32)).result(10)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.stop()
    for i in range(32):
        np.testing.assert_array_equal(results[i], np.full((1,), 2.0 * i))
    # batching actually happened (fewer calls than requests)
    assert len(calls) < 32


def test_http_server_end_to_end():
    """Full stack: Engine on CPU mesh -> batcher -> HTTP predict/stats."""
    import io
    import json
    import urllib.request

    import jax
    from tf2_tpu.graph import init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.runtime import Engine
    from tf2_tpu.serve import InferenceServer, serve_http

    g = get_model("squeezenet_v1_1", batch=4, image=32, classes=10)
    params = init_params(g)
    srv = InferenceServer(Engine(g, params), batch_size=4).start()
    httpd = serve_http(srv, port=18476)
    try:
        with urllib.request.urlopen("http://127.0.0.1:18476/healthz") as r:
            assert json.load(r)["ok"]
        buf = io.BytesIO()
        np.save(buf, np.random.rand(32, 32, 3).astype(np.float32))
        req = urllib.request.Request("http://127.0.0.1:18476/predict",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.load(r)["output"]
        assert len(out) == 10
        with urllib.request.urlopen("http://127.0.0.1:18476/stats") as r:
            stats = json.load(r)
        assert stats["requests"] >= 1
        # probe: malformed payload -> 400, not a crash
        req = urllib.request.Request("http://127.0.0.1:18476/predict",
                                     data=b"garbage", method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()
