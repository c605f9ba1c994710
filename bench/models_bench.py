"""Multi-model throughput/latency bench over the quantized engine.

    python -m bench.models_bench [--models resnet50,squeezenet_v1_1,...]
                                 [--batches 1,64] [--wbits 4]

Builds each artifact offline (CPU subprocess via transform CLI semantics),
then measures on the current device with device-side timing. Prints one
JSON line per (model, batch).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_artifact(model: str, wbits: int, image: int) -> str:
    art = f"/tmp/tf2tpu_art_{model}_w{wbits}"
    if os.path.exists(os.path.join(art, "graph.json")):
        return art
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "tf2_tpu.transform.cli", "--model", model,
           "--wbits", str(wbits), "--out", art, "--batch", "2",
           "--image", str(image), "--calib-batches", "2"]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1800,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if r.returncode != 0:
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError(f"transform failed for {model}")
    return art


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="resnet50,squeezenet_v1_1,googlenet")
    ap.add_argument("--batches", default="1,64")
    ap.add_argument("--wbits", type=int, default=4)
    ap.add_argument("--image", type=int, default=224)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tf2_tpu.runtime import Engine
    from tf2_tpu.transform import load_artifact
    from bench.roofline import analyze

    for model in args.models.split(","):
        art = ensure_artifact(model, args.wbits, args.image)
        graph, params = load_artifact(art)
        for b in (int(x) for x in args.batches.split(",")):
            g = graph.with_batch_size(b)
            eng = Engine(g, params)
            x = jax.random.normal(jax.random.PRNGKey(0),
                                  g.inputs["image"].shape, jnp.float32)
            stats = eng.benchmark(iters=10, reps=2, image=x)
            roof = analyze(g)
            print(json.dumps({
                "model": model, "batch": b, "wbits": args.wbits,
                "img_per_s": round(stats["throughput_per_s"], 1),
                "ms_per_batch": round(stats["latency_s"] * 1e3, 3),
                "sol_ms": round(roof["sol_ms"], 3),
                "sol_fraction": round(roof["sol_ms"] / (stats["latency_s"] * 1e3), 3),
                "bound": roof["bound"],
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
