"""Honest per-shape Pallas-vs-XLA sweep on the real chip (VERDICT r2
items 1/3): noise-floor-aware timing, SOL sanity rejection, whole-graph
A/B validation before any table is committed as a repo default.

Usage:
    python -m bench.tune_sweep [--model resnet50] [--batches 64,1]
        [--commit-defaults] [--art DIR]

Writes the measured table to ~/.cache/tf2_tpu/routing_<backend>.json and,
with --commit-defaults, to kernels/routing_defaults/ ONLY if the whole-
graph A/B keeps at least one pallas route (otherwise the committed default
stays empty — an empty table IS the correct default when XLA wins
everywhere; see autotune.py's default-policy note).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_artifact(art: str, model: str, wbits: int = 4):
    # stale-artifact guard: a cached artifact built by an older zoo is
    # rebuilt rather than silently measured (its graph attrs/ops differ)
    from tf2_tpu.models import ZOO_VERSION
    stamp = os.path.join(art, f".zoo_v{ZOO_VERSION}")
    if os.path.exists(os.path.join(art, "graph.json")):
        if os.path.exists(stamp):
            return
        import shutil
        shutil.rmtree(art)
    os.makedirs(art, exist_ok=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    image = "256" if model == "ssd" else "224"  # SSD heads need 64 | image
    cmd = [sys.executable, "-m", "tf2_tpu.transform.cli",
           "--model", model, "--wbits", str(wbits), "--out", art,
           "--batch", "2", "--image", image, "--calib-batches", "2"]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1800)
    if r.returncode != 0:
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError("transform stage failed")
    # stamp only AFTER the transform succeeded — a stamp written first
    # would make a partial artifact look valid to later runs (ADVICE r4)
    with open(stamp, "w") as f:
        f.write("")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--art", default="/tmp/tf2tpu_bench_r50_int4")
    ap.add_argument("--batches", default="64,1")
    ap.add_argument("--commit-defaults", action="store_true")
    ap.add_argument("--signal-ratio", type=float, default=10.0)
    ap.add_argument("--margin", type=float, default=1.10)
    args = ap.parse_args(argv)

    ensure_artifact(args.art, args.model)

    from tf2_tpu.kernels import autotune
    from tf2_tpu.runtime import compile_cache
    from tf2_tpu.runtime.timing import noise_floor_s
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    graph, params = load_artifact(args.art)
    print(f"noise floor: {noise_floor_s()*1e3:.3f} ms", flush=True)

    for b in (int(x) for x in args.batches.split(",")):
        g = graph.with_batch_size(b)
        print(f"=== sweep {args.model} batch={b} ===", flush=True)
        autotune.tune_graph(g, params, verbose=True,
                            signal_ratio=args.signal_ratio,
                            margin=args.margin)
        v = autotune.validate_routes(g, params, verbose=True)
        print(f"whole-graph A/B b={b}: routed {v['routed_ms']:.3f} ms vs "
              f"pure-XLA {v['xla_ms']:.3f} ms -> "
              f"{'KEPT' if v['kept'] else 'demoted all pallas routes'}",
              flush=True)
    autotune.save()

    tbl = autotune._load()
    n_pallas = sum(1 for w in tbl["routes"].values() if w == "pallas")
    print(f"table: {len(tbl['routes'])} entries, {n_pallas} pallas wins")
    if args.commit_defaults:
        if n_pallas:
            path = autotune.save_defaults()
            print(f"committed defaults -> {path}")
        else:
            print("no validated pallas wins - defaults left empty")
    print(json.dumps(tbl["detail"], indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
