"""Serving steady-state benchmark (VERDICT r3 task 6): continuous batcher
-> donated-input engine at b64 under synthetic load.

Two rows, written to SERVING.json:
- "engine_steady": a host loop feeding FRESH host batches through the
  donate_inputs=True engine (the serving data path without request
  plumbing): sustained img/s + the donation A/B (donate on vs off).
- "serving": InferenceServer + ContinuousBatcher under N client threads
  submitting single images: sustained img/s, p50/p95/p99 request latency,
  batch occupancy. This number includes Python request handling — it is
  the honest end-to-end serving figure, distinct from the raw engine row
  (BASELINE.md gets both).

Usage: python -m bench.serving_bench [--batch 64] [--seconds 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def engine_steady(graph, params, batch: int, seconds: float,
                  donate: bool) -> dict:
    import jax
    import numpy as np

    from tf2_tpu.runtime.engine import Engine

    g = graph.with_batch_size(batch)
    eng = Engine(g, params, donate_inputs=donate)
    iname = next(iter(g.inputs))
    shape = g.inputs[iname].shape
    rng = np.random.default_rng(0)
    batches = [rng.standard_normal(shape, np.float32) for _ in range(4)]
    eng.build(**{iname: batches[0].copy()})
    # steady loop: fresh (rotated) host batches, async dispatch with a
    # 2-deep pipeline so host upload overlaps device compute
    n_steps = 8
    outs = []
    t0 = time.perf_counter()
    steps = 0
    while time.perf_counter() - t0 < seconds:
        x = batches[steps % len(batches)]
        # BOTH arms get a fresh copy: round 4 copied only in the donate
        # arm, and that asymmetry (not donation) produced the 985-vs-315
        # img/s "win" through the relay — the fair A/B measures no delta
        # (VERDICT r4 weak #4; BASELINE.md §4.4 correction)
        outs.append(eng(**{iname: x.copy()}))
        if len(outs) > 2:
            jax.block_until_ready(outs.pop(0))
        steps += 1
    for o in outs:
        jax.block_until_ready(o)
    dt = time.perf_counter() - t0
    return {"img_per_s": round(batch * steps / dt, 1), "steps": steps,
            "donate": donate}


def serving_load(graph, params, batch: int, seconds: float,
                 clients: int = 24) -> dict:
    import numpy as np

    from tf2_tpu.runtime.engine import Engine
    from tf2_tpu.serve.server import InferenceServer

    g = graph.with_batch_size(batch)
    eng = Engine(g, params, donate_inputs=True)
    iname = next(iter(g.inputs))
    shape = tuple(g.inputs[iname].shape[1:])
    srv = InferenceServer(eng, batch, input_name=iname, max_wait_s=0.002)
    srv.start()
    # warm the serving path end-to-end before opening the load window:
    # the donated executable is distinct from the non-donated one, so the
    # first request pays a full XLA compile (minutes under the relay)
    warm = np.zeros(shape, np.float32)
    srv.predict(warm, timeout=600)
    lat: list[float] = []
    lock = threading.Lock()
    stop = threading.Event()
    done = [0]

    def client():
        rng = np.random.default_rng(threading.get_ident() % 2**31)
        x = rng.standard_normal(shape).astype(np.float32)
        while not stop.is_set():
            t0 = time.perf_counter()
            srv.predict(x)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                done[0] += 1

    threads = [threading.Thread(target=client, daemon=True)
               for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    wall = time.perf_counter() - t0
    srv.stop()
    ls = sorted(lat)

    def pct(p):
        if not ls:
            return None
        return round(ls[min(len(ls) - 1, int(p * len(ls)))] * 1e3, 2)

    st = srv.stats()
    return {"img_per_s": round(done[0] / wall, 1),
            "requests": done[0], "clients": clients,
            "p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99),
            "avg_occupancy": round(st.get("avg_occupancy", 0.0), 3),
            "note": "under the axon relay each dispatch costs ~25-200 ms "
                    "RPC, so host-driven rates measure the relay, not the "
                    "chip (device step is the §4.1 number); the relative "
                    "donate-vs-nodonate delta and the batcher structure "
                    "are the meaningful signals here"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--art", default="/tmp/tf2tpu_bench_r50_int4")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--clients", type=int, default=24)
    args = ap.parse_args(argv)

    from bench.tune_sweep import ensure_artifact
    from tf2_tpu.runtime import compile_cache
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    ensure_artifact(args.art, args.model)
    graph, params = load_artifact(args.art)

    report = {"model": args.model, "batch": args.batch}
    report["engine_steady_donate"] = engine_steady(
        graph, params, args.batch, args.seconds, donate=True)
    report["engine_steady_nodonate"] = engine_steady(
        graph, params, args.batch, args.seconds, donate=False)
    report["serving"] = serving_load(graph, params, args.batch,
                                     args.seconds, args.clients)
    print(json.dumps(report, indent=1))
    with open(os.path.join(REPO, "SERVING.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
