"""Profiler-trace cross-check of the scan-timing methodology (SURVEY.md
§6.1; VERDICT r2 item 7).

Captures a jax.profiler trace (perfetto JSON — the installed
tensorboard-plugin-profile's xplane converter is broken against this TF
build) of the quantized ResNet-50 forward at b64 and b1, aggregates
per-track device event durations, and reconciles the per-step device time
against runtime/timing.py's scan-chained measurement. Writes
PROFILE_TRACE.json at the repo root and prints the top device ops.

Usage: python -m bench.profile_trace [--steps 8]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def find_perfetto(log_dir: str) -> str | None:
    hits = glob.glob(os.path.join(log_dir, "**", "*perfetto*"),
                     recursive=True)
    return hits[0] if hits else None


def load_trace(path: str) -> dict:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        return json.loads(f.read().decode())


def aggregate(trace: dict) -> dict:
    """Sum event durations per (process/track, name)."""
    # perfetto chrome-trace JSON: processes named via metadata events
    proc_names = {}
    track_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", str(ev["pid"]))
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            track_names[(ev["pid"], ev.get("tid"))] = ev["args"].get(
                "name", "")
    per_track: dict = defaultdict(lambda: defaultdict(float))
    spans: dict = defaultdict(lambda: [float("inf"), 0.0])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        key = (proc_names.get(pid, str(pid)),
               track_names.get((pid, tid), str(tid)))
        dur = float(ev.get("dur", 0.0))
        per_track[key][ev.get("name", "?")] += dur
        t0 = float(ev.get("ts", 0.0))
        spans[key][0] = min(spans[key][0], t0)
        spans[key][1] = max(spans[key][1], t0 + dur)
    return {"per_track": per_track, "spans": spans}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--art", default="/tmp/tf2tpu_bench_r50_int4")
    ap.add_argument("--logdir", default="/tmp/tf2tpu_trace")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench.tune_sweep import ensure_artifact
    from tf2_tpu.runtime import compile_cache
    from tf2_tpu.runtime.engine import Engine
    from tf2_tpu.runtime.timing import device_time_checked
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    ensure_artifact(args.art, "resnet50")
    graph, params = load_artifact(args.art)
    report = {}
    for b in (64, 1):
        g = graph.with_batch_size(b)
        eng = Engine(g, params)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              g.inputs["image"].shape, jnp.float32)
        eng.build(image=x)  # compile outside the trace

        # scan-chained timing (the methodology under audit)
        def step(xx, p):
            return eng._fn(p, **{"image": xx})
        scan = device_time_checked(step, (x, eng.params),
                                   iters=60 if b > 8 else 600, reps=3)

        logdir = f"{args.logdir}_b{b}"
        with jax.profiler.trace(logdir, create_perfetto_trace=True):
            for _ in range(args.steps):
                out = eng(image=x)
            jax.block_until_ready(out)

        entry = {"scan_ms_per_step": round(scan["time_s"] * 1e3, 4),
                 "steps_traced": args.steps, "logdir": logdir}
        pf = find_perfetto(logdir)
        if pf:
            agg = aggregate(load_trace(pf))
            # device tracks: TPU/device process names
            dev_tracks = {k: v for k, v in agg["per_track"].items()
                          if any(s in (k[0] + k[1]).lower()
                                 for s in ("tpu", "device", "/device"))}
            busy_us = {f"{k[0]}|{k[1]}": sum(v.values())
                       for k, v in dev_tracks.items()}
            top = sorted(((n, d) for k, v in dev_tracks.items()
                          for n, d in v.items()), key=lambda t: -t[1])[:20]
            entry["device_busy_us_per_track"] = {
                k: round(v, 1) for k, v in busy_us.items()}
            entry["device_ms_per_step_busiest_track"] = round(
                max(busy_us.values(), default=0.0) / args.steps / 1e3, 4)
            entry["top_device_ops_us"] = [
                {"name": n[:120], "total_us": round(d, 1)} for n, d in top]
        else:
            entry["error"] = "no perfetto trace emitted"
        report[f"batch{b}"] = entry
        print(json.dumps({k: v for k, v in entry.items()
                          if k != "top_device_ops_us"}, indent=1),
              flush=True)
        for row in entry.get("top_device_ops_us", [])[:12]:
            print(f"  {row['total_us']:>12.1f} us  {row['name']}",
                  flush=True)

    with open(os.path.join(REPO, "PROFILE_TRACE.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
