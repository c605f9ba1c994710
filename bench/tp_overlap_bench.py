#!/usr/bin/env python
"""Ring-overlapped TP matmul vs GSPMD all_gather->matmul A/B (VERDICT r2
item 9's recorded comparison).

Runs on the 8-virtual-CPU-device mesh by default (no TPU needed; CPU
numbers measure scheduling structure, not ICI — re-run on a real slice
for the gate). Writes TP_OVERLAP.json at the repo root.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python bench/tp_overlap_bench.py
"""
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the axon sitecustomize overrides the JAX_PLATFORMS env var; force CPU
# through the config so this never silently grabs the (single) TPU chip
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    from tf2_tpu.parallel import make_mesh
    from tf2_tpu.parallel.tp_overlap import allgather_matmul, gspmd_matmul
    from tf2_tpu.runtime.timing import device_time_checked

    assert jax.default_backend() == "cpu" and jax.device_count() >= 2, (
        "tp_overlap_bench needs the virtual CPU mesh")
    cfg = make_mesh(tp=jax.device_count())
    m, k, n = 512, 2048, 1024
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    y = jax.device_put(jax.random.normal(k1, (m, k), jnp.float32),
                       cfg.named(None, cfg.tp_axis))
    w = jax.random.normal(k2, (k, n), jnp.float32)

    t_ring = device_time_checked(
        lambda yy, ww: allgather_matmul(cfg, yy, ww), (y, w),
        iters=16, reps=3)["time_s"]
    t_gspmd = device_time_checked(
        lambda yy, ww: gspmd_matmul(cfg, yy, ww), (y, w),
        iters=16, reps=3)["time_s"]
    result = {
        "mesh": f"cpu x{jax.device_count()} (virtual, tp only)",
        "shape": f"({m},{k})x({k},{n}) f32, K sharded tp={cfg.tp}",
        "ring_overlap_ms": round(t_ring * 1e3, 4),
        "gspmd_ms": round(t_gspmd * 1e3, 4),
        "ratio_ring_over_gspmd": round(t_ring / t_gspmd, 3),
        "note": "CPU virtual mesh: measures schedule structure only; "
                "ICI overlap benefit needs a real slice",
    }
    with open(os.path.join(REPO, "TP_OVERLAP.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
