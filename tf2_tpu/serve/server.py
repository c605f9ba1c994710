"""Serving layer: engine + continuous batcher + JSON/HTTP front end +
health/metrics (SURVEY.md §6.3/§6.5).

Reference parity: none (FPGA demo apps were single-shot CLIs). Design:
- ``InferenceServer`` owns an Engine compiled at a fixed batch size and a
  ContinuousBatcher feeding it.
- HTTP endpoints (stdlib http.server; zero deps): POST /predict with a
  base64/np payload, GET /stats (qps, occupancy, p50/p95/p99), GET /healthz.
- Multi-host: each host runs the same server; jax.distributed initializes
  the global mesh at startup (runtime/distributed.py); the batcher runs on
  host 0 ("coordinator dispatch") with per-host shards executing the same
  jitted step — see serve/multihost.py for the dispatch contract.
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..runtime.engine import Engine
from .batcher import ContinuousBatcher


class InferenceServer:
    def __init__(self, engine: Engine, batch_size: int,
                 input_name: str = "image", max_wait_s: float = 0.002):
        self.engine = engine
        self.input_name = input_name
        spec = engine.graph.inputs[input_name]
        assert spec.shape[0] == batch_size, (
            f"engine graph batch {spec.shape[0]} != server batch {batch_size}")
        self._example_shape = tuple(spec.shape[1:])
        self.batcher = ContinuousBatcher(
            self._run, batch_size, self._example_shape,
            max_wait_s=max_wait_s)
        self._t_start = time.time()

    def _run(self, batch: np.ndarray) -> np.ndarray:
        out = self.engine.run(**{self.input_name: batch})
        return np.asarray(out)

    def start(self) -> "InferenceServer":
        self.engine.build()
        self.batcher.start()
        return self

    def predict(self, x: np.ndarray, timeout: float = 30.0) -> np.ndarray:
        return self.batcher.submit(np.asarray(x, np.float32)).result(timeout)

    def stats(self) -> dict:
        s = self.batcher.stats()
        s["uptime_s"] = time.time() - self._t_start
        s["qps"] = s["requests"] / max(s["uptime_s"], 1e-9)
        return s

    def stop(self):
        self.batcher.stop()


def serve_http(server: InferenceServer, port: int = 8476) -> ThreadingHTTPServer:
    """Start the HTTP front end on a background thread; returns the httpd
    (call .shutdown() to stop)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, server.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            try:
                # payload: raw .npy bytes
                x = np.load(io.BytesIO(raw), allow_pickle=False)
                y = server.predict(x)
                self._json(200, {"output": y.tolist()})
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
