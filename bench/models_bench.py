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


def ensure_artifact(model: str, wbits: int, image: int,
                    prune: float = 0.0) -> str:
    from tf2_tpu.models import ZOO_VERSION
    art = f"/tmp/tf2tpu_art_{model}_w{wbits}_z{ZOO_VERSION}"
    if prune:
        art += f"_p{int(prune * 100)}"
    if os.path.exists(os.path.join(art, "graph.json")):
        return art
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "tf2_tpu.transform.cli", "--model", model,
           "--wbits", str(wbits), "--out", art, "--batch", "2",
           "--image", str(image), "--calib-batches", "2"]
    if prune:
        cmd += ["--prune", str(prune)]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1800,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if r.returncode != 0:
        sys.stderr.write(r.stdout + r.stderr)
        raise RuntimeError(f"transform failed for {model}")
    return art


# The 5 driver-mandated configs (BASELINE.md §2): model -> (wbits, image)
BASELINE_CONFIGS = {
    "squeezenet_v1_1": (8, 224),
    "googlenet": (4, 224),
    "resnet50": (4, 224),
    "ssd": (4, 256),
    "vit_b16": (8, 224),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(BASELINE_CONFIGS))
    ap.add_argument("--batches", default="1,64")
    ap.add_argument("--wbits", type=int, default=None,
                    help="override; default per BASELINE_CONFIGS")
    ap.add_argument("--image", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="append JSON lines to this file as well")
    ap.add_argument("--prune", type=float, default=0.0,
                    help="channel-prune fraction before quantization "
                         "(VERDICT r2 item 10: measure pruned throughput)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tf2_tpu.runtime import Engine, compile_cache
    from tf2_tpu.transform import load_artifact
    from bench.roofline import analyze

    compile_cache.enable()
    rows = []
    for model in args.models.split(","):
        wbits, image = BASELINE_CONFIGS.get(model, (4, 224))
        wbits = args.wbits or wbits
        image = args.image or image
        art = ensure_artifact(model, wbits, image, args.prune)
        graph, params = load_artifact(art)
        for b in (int(x) for x in args.batches.split(",")):
            g = graph.with_batch_size(b)
            eng = Engine(g, params)
            x = jax.random.normal(jax.random.PRNGKey(0),
                                  g.inputs["image"].shape, jnp.float32)
            # checked two-point timing: sub-ms batch-1 forwards sit below
            # the dispatch jitter and underflow the plain baseline-
            # subtraction mode (VERDICT r2 weak #5)
            stats = eng.benchmark(iters=10 if b > 8 else 64, reps=3,
                                  checked=True, image=x)
            roof = analyze(g)
            row = {
                "model": model, "batch": b, "wbits": wbits, "image": image,
                "prune": args.prune,
                "img_per_s": round(stats["throughput_per_s"], 1),
                "ms_per_batch": round(stats["latency_s"] * 1e3, 3),
                "sol_ms": round(roof["sol_ms"], 3),
                "sol_fraction": round(roof["sol_ms"] / (stats["latency_s"] * 1e3), 3),
                "bound": roof["bound"],
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
