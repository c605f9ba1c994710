"""Continuous batcher — groups async inference requests into fixed-shape
device batches (north star: "continuous batching across hosts").

Reference parity: none — the FPGA stack ran one image stream per process
(SURVEY.md §3 P2). TPU-native design: the executable is compiled for a
fixed batch B (static shapes for XLA); the batcher fills up to B requests
per step, padding the tail, and runs steps back-to-back so the chip never
idles while requests are queued. Latency knob: ``max_wait_s`` bounds how
long a lone request waits for co-riders.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


@dataclass
class BatcherStats:
    requests: int = 0
    batches: int = 0
    occupancy_sum: float = 0.0
    latency_sum_s: float = 0.0
    latencies: list = field(default_factory=list)

    def snapshot(self) -> dict:
        lat = sorted(self.latencies[-1024:])

        def pct(p):
            return lat[min(int(len(lat) * p), len(lat) - 1)] if lat else 0.0

        return {
            "requests": self.requests,
            "batches": self.batches,
            "avg_occupancy": self.occupancy_sum / max(self.batches, 1),
            "avg_latency_s": self.latency_sum_s / max(self.requests, 1),
            "p50_s": pct(0.50), "p95_s": pct(0.95), "p99_s": pct(0.99),
        }


class ContinuousBatcher:
    """Wraps a callable ``run_batch(np.ndarray[B, ...]) -> np.ndarray[B, ...]``
    behind an async submit() API with dynamic batching."""

    def __init__(self, run_batch, batch_size: int, example_shape: tuple,
                 max_wait_s: float = 0.002, dtype=np.float32):
        self.run_batch = run_batch
        self.batch_size = batch_size
        self.example_shape = tuple(example_shape)
        self.max_wait_s = max_wait_s
        self.dtype = dtype
        self._q: queue.Queue = queue.Queue()
        self._stats = BatcherStats()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._started = False

    # ---- client API ----
    def start(self) -> "ContinuousBatcher":
        if not self._started:
            self._thread.start()
            self._started = True
        return self

    def submit(self, x: np.ndarray) -> Future:
        if x.shape != self.example_shape:
            raise ValueError(f"expected {self.example_shape}, got {x.shape}")
        fut: Future = Future()
        self._q.put((x, fut, time.perf_counter()))
        return fut

    def stop(self, drain: bool = True):
        if drain:
            while not self._q.empty():
                time.sleep(0.001)
        self._stop.set()
        if self._started:
            self._thread.join(timeout=5)

    def stats(self) -> dict:
        return self._stats.snapshot()

    # ---- batching loop ----
    def _collect(self) -> list:
        """Block for the first request, then fill the batch for up to
        max_wait_s (or instantly if the queue already has riders)."""
        items = []
        try:
            items.append(self._q.get(timeout=0.05))
        except queue.Empty:
            return items
        deadline = time.perf_counter() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0 and self._q.empty():
                break
            try:
                items.append(self._q.get(timeout=max(remaining, 0.0001)))
            except queue.Empty:
                break
        return items

    def _loop(self):
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            n = len(items)
            batch = np.zeros((self.batch_size,) + self.example_shape, self.dtype)
            for i, (x, _, _) in enumerate(items):
                batch[i] = x
            try:
                out = np.asarray(self.run_batch(batch))
            except Exception as e:  # pragma: no cover - propagate to callers
                for _, fut, _ in items:
                    fut.set_exception(e)
                continue
            now = time.perf_counter()
            for i, (_, fut, t0) in enumerate(items):
                fut.set_result(out[i])
                self._stats.latencies.append(now - t0)
                self._stats.latency_sum_s += now - t0
            self._stats.requests += n
            self._stats.batches += 1
            self._stats.occupancy_sum += n / self.batch_size
